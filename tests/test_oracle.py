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
