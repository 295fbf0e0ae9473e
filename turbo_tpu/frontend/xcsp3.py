"""Minimal XCSP3 frontend.

The reference supports XCSP3 through the optional XCSP3-CPP-Parser
(`WITH_XCSP3PARSER`, common_solving.hpp:409-413); its only shipped
fixture is benchmarks/test_data/cumulative.xml. This parser covers the
core XCSP3 subset (integer var arrays, extension-free constraints:
sum, allDifferent, intension-free cumulative with constant
lengths/heights) by lowering to the same Model AST the FlatZinc
frontend produces — globals are decomposed into FlatZinc builtins
(time-indexed decomposition for cumulative), mirroring how MiniZinc
pre-decomposes globals for the reference (SURVEY.md §2a: mzn-lib has
no global redefinitions).
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple, Union

from .ast import Constraint, Model, SearchAnnotation, SolveItem, VarDecl


class Xcsp3Error(Exception):
    pass


def _parse_values(text: str) -> List[int]:
    """Parse a whitespace-separated value list with 'VxK' compression."""
    out = []
    for tok in text.split():
        m = re.fullmatch(r"(-?\d+)x(\d+)", tok)
        if m:
            out.extend([int(m.group(1))] * int(m.group(2)))
        else:
            out.append(int(tok))
    return out


def _parse_domain(text: str) -> Tuple[int, int]:
    text = text.strip()
    m = re.fullmatch(r"(-?\d+)\.\.(-?\d+)", text)
    if m:
        return int(m.group(1)), int(m.group(2))
    vals = _parse_values(text)
    return min(vals), max(vals)


class _Builder:
    def __init__(self):
        self.vars: List[VarDecl] = []
        self.constraints: List[Constraint] = []
        self.var_names: Dict[str, List[str]] = {}  # array id -> element names
        self.aux = 0

    def new_aux(self, lb, ub, bool_=False) -> str:
        self.aux += 1
        name = f"__aux_{self.aux}"
        self.vars.append(VarDecl(name, bool_, lb, ub, None, introduced=True))
        return name

    def resolve_list(self, text: str) -> List[str]:
        """Resolve 'x[]' / 'x[1] y[2]' style variable references."""
        out = []
        for tok in text.split():
            m = re.fullmatch(r"(\w+)\[\]", tok)
            if m:
                out.extend(self.var_names[m.group(1)])
                continue
            m = re.fullmatch(r"(\w+)\[(\d+)\]", tok)
            if m:
                out.append(self.var_names[m.group(1)][int(m.group(2))])
                continue
            out.append(tok)
        return out


def parse_xcsp3(path: str) -> Model:
    tree = ET.parse(path)
    root = tree.getroot()
    b = _Builder()

    for v in root.find("variables") or []:
        if v.tag == "array":
            size = v.get("size", "[1]")
            m = re.fullmatch(r"\[(\d+)\]", size)
            if not m:
                raise Xcsp3Error(f"unsupported array size {size!r}")
            n = int(m.group(1))
            lo, hi = _parse_domain(v.text or "")
            names = []
            aid = v.get("id")
            for i in range(n):
                nm = f"{aid}[{i}]"
                b.vars.append(VarDecl(nm, False, lo, hi, None, output_var=True))
                names.append(nm)
            b.var_names[aid] = names
        elif v.tag == "var":
            lo, hi = _parse_domain(v.text or "")
            b.vars.append(VarDecl(v.get("id"), False, lo, hi, None,
                                  output_var=True))
            b.var_names[v.get("id")] = [v.get("id")]

    cons = root.find("constraints")
    if cons is not None:
        for c in cons:
            _lower_constraint(b, c)

    solve = SolveItem("satisfy", None, [])
    objs = root.find("objectives")
    if objs is not None:
        for o in objs:
            kind = "minimize" if o.tag == "minimize" else "maximize"
            typ = o.get("type", "expression")
            terms = b.resolve_list((o.text or "").strip())
            if typ in ("sum", "expression"):
                if len(terms) == 1:
                    obj = terms[0]
                else:
                    obj = b.new_aux(None, None)
                    b.constraints.append(Constraint(
                        "int_lin_eq",
                        [[1] * len(terms) + [-1], terms + [obj], 0]))
                solve = SolveItem(kind, obj, [])
            else:
                raise Xcsp3Error(f"unsupported objective type {typ!r}")
            break

    return Model(b.vars, [], b.constraints, solve, path)


def _lower_constraint(b: _Builder, c):
    if c.tag == "cumulative":
        _lower_cumulative(b, c)
    elif c.tag == "allDifferent":
        vs = b.resolve_list((c.text or "").strip())
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                b.constraints.append(Constraint("int_ne", [vs[i], vs[j]]))
    elif c.tag == "sum":
        vs = b.resolve_list((c.find("list").text or "").strip())
        coeffs_el = c.find("coeffs")
        coeffs = _parse_values(coeffs_el.text) if coeffs_el is not None \
            else [1] * len(vs)
        op, k = _parse_condition(c.find("condition").text)
        name = {"le": "int_lin_le", "eq": "int_lin_eq",
                "ne": "int_lin_ne"}.get(op)
        if name is None:
            if op == "ge":
                coeffs = [-v for v in coeffs]
                k = -k
                name = "int_lin_le"
            else:
                raise Xcsp3Error(f"unsupported sum condition {op!r}")
        b.constraints.append(Constraint(name, [coeffs, vs, k]))
    else:
        raise Xcsp3Error(f"unsupported constraint <{c.tag}>")


def _parse_condition(text: str) -> Tuple[str, int]:
    m = re.fullmatch(r"\s*\((\w+),\s*(-?\d+)\)\s*", text)
    if not m:
        raise Xcsp3Error(f"unsupported condition {text!r}")
    return m.group(1), int(m.group(2))


def _lower_cumulative(b: _Builder, c):
    """Time-indexed decomposition: for each time t,
    sum_i h_i * [x_i <= t < x_i + l_i] <= cap."""
    origins = b.resolve_list((c.find("origins").text or "").strip())
    lengths = _parse_values(c.find("lengths").text)
    heights = _parse_values(c.find("heights").text)
    op, cap = _parse_condition(c.find("condition").text)
    if op != "le":
        raise Xcsp3Error(f"unsupported cumulative condition {op!r}")
    doms = {v.name: (v.lb, v.ub) for v in b.vars}
    lo_t = min(doms[o][0] for o in origins)
    hi_t = max(doms[o][1] + l - 1 for o, l in zip(origins, lengths))
    for t in range(lo_t, hi_t + 1):
        terms, hs = [], []
        for o, l, h in zip(origins, lengths, heights):
            # b1 = (x_o <= t), b2 = (t - l + 1 <= x_o), run = b1 & b2
            b1 = b.new_aux(0, 1, bool_=True)
            b.constraints.append(Constraint("int_le_reif", [o, t, b1]))
            b2 = b.new_aux(0, 1, bool_=True)
            b.constraints.append(Constraint("int_le_reif", [t - l + 1, o, b2]))
            run = b.new_aux(0, 1, bool_=True)
            b.constraints.append(Constraint("bool_and", [b1, b2, run]))
            terms.append(run)
            hs.append(h)
        b.constraints.append(Constraint("int_lin_le", [hs, terms, cap]))
