"""Parser + TNF compiler tests over the reference fixture corpus."""
import glob

import numpy as np
import pytest

from turbo_tpu.frontend.fzn import parse_fzn, parse_fzn_text
from turbo_tpu.compile.model import compile_model
from turbo_tpu.core.ops import INF, NINF

ALL_FZN = sorted(glob.glob("/root/reference/benchmarks/**/*.fzn", recursive=True))
PARSEABLE = [f for f in ALL_FZN if "valve6" not in f]  # valve6 uses set vars


@pytest.mark.parametrize("path", PARSEABLE, ids=lambda p: p.split("/")[-1])
def test_parse_all_fixtures(path):
    m = parse_fzn(path)
    assert m.solve.kind in ("satisfy", "minimize", "maximize")


@pytest.mark.parametrize("path", PARSEABLE, ids=lambda p: p.split("/")[-1])
def test_compile_all_fixtures(path):
    tnf = compile_model(parse_fzn(path))
    V, P = tnf.num_vars, tnf.num_props
    assert (tnf.lb0 <= tnf.ub0).all() or tnf.root_unsat
    if P:
        for arr in (tnf.xs, tnf.ys, tnf.zs):
            assert arr.min() >= 0 and arr.max() < V


def test_parse_basics():
    m = parse_fzn_text(
        """
        var 1..9: x :: output_var;
        var bool: b;
        array [1..2] of int: c = [2,-3];
        constraint int_lin_le(c, [x, x], 7);
        solve :: int_search([x], first_fail, indomain_min, complete) minimize x;
        """
    )
    assert len(m.vars) == 2
    assert m.vars[0].lb == 1 and m.vars[0].ub == 9
    assert m.solve.kind == "minimize"
    assert m.solve.searches[0].var_order == "first_fail"


def test_sparse_domain_membership():
    tnf = compile_model(parse_fzn_text(
        "var {1,3,7}: x :: output_var;\nsolve maximize x;"))
    assert not tnf.root_unsat
    # Hull bounds 1..7 at the variable.
    assert tnf.lb0[tnf.orig_obj_var] == 1
    assert tnf.ub0[tnf.orig_obj_var] == 7


def test_trivially_false():
    tnf = compile_model(parse_fzn_text(
        "constraint bool_eq(false, true);\nsolve satisfy;"))
    assert tnf.root_unsat


def test_cse_dedups_shared_linear_terms():
    t1 = compile_model(parse_fzn_text(
        """
        var 0..9: x; var 0..9: y :: output_var;
        array [1..2] of int: c = [2,3];
        constraint int_lin_le(c, [x,y], 20);
        constraint int_lin_le(c, [x,y], 15);
        solve minimize y;
        """
    ))
    t2 = compile_model(parse_fzn_text(
        """
        var 0..9: x; var 0..9: y :: output_var;
        array [1..2] of int: c = [2,3];
        constraint int_lin_le(c, [x,y], 20);
        solve minimize y;
        """
    ))
    # The duplicate lin_le shares the whole sum tree: no extra props,
    # the tighter bound lands in the domain meet.
    assert t1.num_props == t2.num_props


@pytest.mark.parametrize("path", PARSEABLE[:12], ids=lambda p: p.split("/")[-1])
def test_native_parser_matches_python(path):
    from turbo_tpu.frontend.fzn import parse_fzn, parse_fzn_text
    from turbo_tpu.frontend.native import parse_fzn_native

    text = open(path).read()
    mp = parse_fzn_text(text, path)
    mn = parse_fzn_native(text, path)
    if mn is None:
        pytest.skip("native parser unavailable")
    assert [(v.name, v.is_bool, v.lb, v.ub, v.sparse, v.output_var, v.alias)
            for v in mp.vars] == \
           [(v.name, v.is_bool, v.lb, v.ub, v.sparse, v.output_var, v.alias)
            for v in mn.vars]
    assert [(c.name, repr(c.args), c.defines) for c in mp.constraints] == \
           [(c.name, repr(c.args), c.defines) for c in mn.constraints]
    assert mp.solve == mn.solve


def test_search_annotation_array_expansion():
    """Search annotations naming a var ARRAY must expand to its
    elements (pat1's seq_search previously produced empty strategies,
    degrading search to the default order)."""
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.compile.model import compile_model
    tnf = compile_model(parse_fzn(
        "/root/reference/benchmarks/test_data/pat1.fzn"))
    assert len(tnf.strategies) == 3
    assert len(tnf.strategies[0].var_ids) == 14   # X_INTRODUCED_555_
    assert len(tnf.strategies[1].var_ids) == 182  # X_INTRODUCED_554_
    assert tnf.strategies[0].var_order == "smallest"


def test_pat1_proves_with_annotated_search():
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.solver.oracle import solve
    tnf = compile_model(parse_fzn(
        "/root/reference/benchmarks/test_data/pat1.fzn"))
    r = solve(tnf, timeout_s=60)
    assert r.status == "optimal" and r.objective == 19
    assert r.stats.nodes < 1000


def test_unsolved_bugs_fixtures_handled():
    """The reference's known-bad instances (benchmarks/unsolved_bugs_data)
    must not crash the frontend/compiler: false.fzn is trivially unsat,
    bigdom.fzn (huge domains) parses and compiles under the clamped
    +-2^30 universe, valve6.fzn (raw set VARIABLES, which the reference
    also cannot represent — its mzn-lib routes sets through nosets.mzn)
    fails with an explicit diagnostic."""
    import pytest

    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.frontend.fzn import FznParseError, parse_fzn
    from turbo_tpu.solver.oracle import solve

    base = "/root/reference/benchmarks/unsolved_bugs_data"
    r = solve(compile_model(parse_fzn(f"{base}/false.fzn")), timeout_s=10)
    assert r.status == "unsat"

    tnf = compile_model(parse_fzn(f"{base}/bigdom.fzn"))
    assert tnf.num_vars > 0

    with pytest.raises(FznParseError):
        parse_fzn(f"{base}/valve6.fzn")
