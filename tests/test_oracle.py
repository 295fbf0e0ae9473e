"""Golden-objective tests for the sequential oracle solver.

The expected bounds come from the reference regression list
(/root/reference/benchmarks/test_list.csv, harness test_turbo.sh).
Only instances the Python oracle can finish quickly are asserted to
optimality; the rest are covered by the batched engine tests.
"""
import pytest

from turbo_tpu.frontend.fzn import parse_fzn
from turbo_tpu.compile.model import compile_model
from turbo_tpu.solver.oracle import solve

FAST_GOLDEN = [
    ("minimize_unconstrained", 1),
    ("minimize_unconstrained2", 1),
    ("maximize_unconstrained", 2),
    ("maximize_unconstrained2", 2),
    ("reified_in", 1),
    ("bug1", -10),
    ("bug3", 0),
    ("bug5", 2),
    ("sudoku_opt2", -2),
    ("sudoku_opt2_max", 2),
    ("sudoku_opt3", -2),
    ("sudoku_opt3b", 2),
    ("sudoku_opt4", -16),
    ("sudoku_opt4b", 0),
    ("pat2", 7),
]


@pytest.mark.parametrize("name,expected", FAST_GOLDEN, ids=[c[0] for c in FAST_GOLDEN])
def test_golden_objective(name, expected, bench_dir):
    tnf = compile_model(parse_fzn(str(bench_dir / "test_data" / f"{name}.fzn")))
    r = solve(tnf, timeout_s=60)
    assert r.status == "optimal"
    assert r.objective == expected


@pytest.mark.slow
def test_golden_sudoku_p0(bench_dir):
    tnf = compile_model(parse_fzn(str(bench_dir / "test_data" / "sudoku_opt_p0.fzn")))
    r = solve(tnf, timeout_s=120)
    assert r.status == "optimal" and r.objective == -3


def test_unsat(bench_dir):
    tnf = compile_model(parse_fzn(str(bench_dir / "unsolved_bugs_data" / "false.fzn")))
    r = solve(tnf, timeout_s=10)
    assert r.status == "unsat"


def test_array_int_minimum_maximum():
    """array_int_minimum/maximum builtins (MiniZinc's min()/max() over
    var arrays) as balanced OP_MIN/OP_MAX fold trees."""
    from turbo_tpu.frontend.fzn import parse_fzn_text
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.solver.oracle import solve
    text = """
    var 3..9: a; var 1..7: b; var 5..6: c;
    var 0..20: lo :: output_var; var 0..20: hi :: output_var;
    constraint array_int_minimum(lo, [a, b, c]);
    constraint array_int_maximum(hi, [a, b, c]);
    constraint int_le(hi, 5);
    solve minimize lo;
    """
    r = solve(compile_model(parse_fzn_text(text)), timeout_s=30)
    # hi <= 5 forces a<=5, b<=5, c=5; min lo = min(3,1,5) = 1.
    assert r.status == "optimal" and r.objective == 1


def test_int_pow_fixed_exponent():
    from turbo_tpu.frontend.fzn import parse_fzn_text
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.solver.oracle import solve
    text = """
    var 1..5: x :: output_var; var 0..200: z;
    constraint int_pow(x, 3, z);
    constraint int_le(30, z);
    solve minimize x;
    """
    r = solve(compile_model(parse_fzn_text(text)), timeout_s=30)
    # x^3 >= 30 -> x >= 4.
    assert r.status == "optimal" and r.objective == 4


def test_int_pow_var_exponent_fails_loudly():
    import pytest as _pytest
    from turbo_tpu.frontend.fzn import parse_fzn_text
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.compile.tnf import CompileError
    text = """
    var 1..5: x; var 1..3: n; var 0..200: z;
    constraint int_pow(x, n, z);
    solve satisfy;
    """
    with _pytest.raises(CompileError):
        compile_model(parse_fzn_text(text))
