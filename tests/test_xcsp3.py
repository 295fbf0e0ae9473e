from turbo_tpu.frontend.xcsp3 import parse_xcsp3
from turbo_tpu.compile.model import compile_model
from turbo_tpu.solver.oracle import solve


def test_cumulative_golden(bench_dir):
    m = parse_xcsp3(str(bench_dir / "test_data" / "cumulative.xml"))
    tnf = compile_model(m)
    r = solve(tnf, timeout_s=60)
    assert r.status == "optimal"
    assert r.objective == 0
