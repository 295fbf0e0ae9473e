"""XCSP3-core widening (round 5): ordered / allEqual / channel /
count / cardinality / nValues / regular, verified by exact solution
counts against the sequential oracle (reference analog:
XCSP3-CPP-Parser's core constraint set, common_solving.hpp:409-413)."""
from turbo_tpu.compile.model import compile_model
from turbo_tpu.frontend.xcsp3 import parse_xcsp3
from turbo_tpu.solver.oracle import solve


def _count(tmp_path, xml) -> int:
    p = tmp_path / "m.xml"
    p.write_text(xml)
    tnf = compile_model(parse_xcsp3(str(p)))
    r = solve(tnf, timeout_s=120, stop_after_n_solutions=0)
    assert r.stats.exhaustive
    return r.stats.solutions


def _csp(variables, constraints):
    return f"""<instance format="XCSP3" type="CSP">
<variables>{variables}</variables>
<constraints>{constraints}</constraints>
</instance>"""


def test_ordered_strict(tmp_path):
    xml = _csp('<array id="x" size="[3]"> 1..3 </array>',
               "<ordered><list> x[] </list>"
               "<operator> lt </operator></ordered>")
    assert _count(tmp_path, xml) == 1  # only (1,2,3)


def test_ordered_with_lengths_and_gt(tmp_path):
    xml = _csp('<array id="x" size="[3]"> 1..5 </array>',
               "<ordered><list> x[] </list><lengths> 1 1 </lengths>"
               "<operator> lt </operator></ordered>")
    assert _count(tmp_path, xml) == 1  # only (1,3,5)
    xml = _csp('<array id="x" size="[3]"> 1..3 </array>',
               "<ordered><list> x[] </list>"
               "<operator> gt </operator></ordered>")
    assert _count(tmp_path, xml) == 1  # only (3,2,1)


def test_all_equal(tmp_path):
    xml = _csp('<array id="x" size="[3]"> 1..3 </array>',
               "<allEqual> x[] </allEqual>")
    assert _count(tmp_path, xml) == 3


def test_channel_one_list(tmp_path):
    # x[x[i]] = i over 0..2: the involutions of S3 -> 4.
    xml = _csp('<array id="x" size="[3]"> 0..2 </array>',
               "<channel><list> x[] </list></channel>")
    assert _count(tmp_path, xml) == 4


def test_channel_two_lists(tmp_path):
    # x a permutation of 0..1, y its inverse -> 2 solutions.
    xml = _csp('<array id="x" size="[2]"> 0..1 </array>'
               '<array id="y" size="[2]"> 0..1 </array>',
               "<channel><list> x[] </list><list> y[] </list></channel>")
    assert _count(tmp_path, xml) == 2


def test_count_int_condition(tmp_path):
    # exactly two 1s among three vars over 1..2 -> C(3,2) = 3.
    xml = _csp('<array id="x" size="[3]"> 1..2 </array>',
               "<count><list> x[] </list><values> 1 </values>"
               "<condition> (eq,2) </condition></count>")
    assert _count(tmp_path, xml) == 3


def test_count_var_condition(tmp_path):
    # k in 0..3, count(x, 1) == k: every assignment of x fixes k -> 8.
    xml = _csp('<array id="x" size="[3]"> 1..2 </array>'
               '<var id="k"> 0..3 </var>',
               "<count><list> x[] </list><values> 1 </values>"
               "<condition> (eq,k) </condition></count>")
    assert _count(tmp_path, xml) == 8


def test_cardinality_exact(tmp_path):
    # one of each value over 1..3 -> the 6 permutations.
    xml = _csp('<array id="x" size="[3]"> 1..3 </array>',
               "<cardinality><list> x[] </list>"
               "<values> 1 2 3 </values><occurs> 1 1 1 </occurs>"
               "</cardinality>")
    assert _count(tmp_path, xml) == 6


def test_cardinality_range_and_closed(tmp_path):
    # closed: values restricted to {1,2}; one 1 and two 2s -> 3.
    xml = _csp('<array id="x" size="[3]"> 1..3 </array>',
               '<cardinality closed="true"><list> x[] </list>'
               "<values> 1 2 </values><occurs> 1 2 </occurs>"
               "</cardinality>")
    assert _count(tmp_path, xml) == 3
    # range occurs: between 1 and 2 ones over two binary vars -> 3.
    xml = _csp('<array id="x" size="[2]"> 1..2 </array>',
               "<cardinality><list> x[] </list>"
               "<values> 1 </values><occurs> 1..2 </occurs>"
               "</cardinality>")
    assert _count(tmp_path, xml) == 3


def test_nvalues(tmp_path):
    # exactly 2 distinct values among 3 vars over 1..2 -> 8 - 2 = 6.
    xml = _csp('<array id="x" size="[3]"> 1..2 </array>',
               "<nValues><list> x[] </list>"
               "<condition> (eq,2) </condition></nValues>")
    assert _count(tmp_path, xml) == 6


def test_regular_no_consecutive_ones(tmp_path):
    # Binary strings of length 3 without "11" -> 5.
    xml = _csp('<array id="x" size="[3]"> 0..1 </array>',
               "<regular><list> x[] </list>"
               "<transitions> (a,0,a)(a,1,c)(c,0,a) </transitions>"
               "<start> a </start><final> a c </final></regular>")
    assert _count(tmp_path, xml) == 5


def test_regular_exact_word(tmp_path):
    # Automaton accepting exactly the word 1 0 1.
    xml = _csp('<array id="x" size="[3]"> 0..1 </array>',
               "<regular><list> x[] </list>"
               "<transitions> (s,1,p)(p,0,q)(q,1,f) </transitions>"
               "<start> s </start><final> f </final></regular>")
    assert _count(tmp_path, xml) == 1


def test_xcsp3_core_engine_differential(tmp_path):
    """The widened constraints propagate identically on the batched
    engine (table mode) — same count as the oracle."""
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig

    xml = _csp('<array id="x" size="[3]"> 0..2 </array>',
               "<channel><list> x[] </list></channel>")
    p = tmp_path / "m.xml"
    p.write_text(xml)
    tnf = compile_model(parse_xcsp3(str(p)))
    r = BatchedSolver(tnf, EngineConfig(
        num_dives=8, subproblems_power=4, max_depth=64,
        enumerate_all=True)).solve(timeout_s=120,
                                   stop_after_n_solutions=0)
    assert r.exhaustive and r.solutions == 4
