"""Tests for the bench/verify harness (libbench2 analog, SURVEY.md §2.11/§4)."""
import numpy as np
import pytest

from fftw3_tpu import kinds as K
from fftw3_tpu.harness import (BenchProblem, VerificationError, acmp,
                               mflops, parse_problem, verify_problem)
from fftw3_tpu.harness.problem import UnsupportedProblem


class TestProblemParser:
    def test_simple_complex(self):
        p = parse_problem("c1024")
        assert p.kind == "c2c" and p.sizes == (1024,)
        assert p.sign == K.FORWARD and not p.in_place

    def test_inplace_backward(self):
        p = parse_problem("ib256")
        assert p.kind == "c2c" and p.in_place and p.sign == K.BACKWARD
        assert p.sizes == (256,)

    def test_default_complex_2d(self):
        p = parse_problem("32x64")
        assert p.kind == "c2c" and p.sizes == (32, 64)

    def test_ocf(self):
        p = parse_problem("ocf1024")
        assert p.kind == "c2c" and not p.in_place
        assert p.sign == K.FORWARD and p.sizes == (1024,)

    def test_real_forward_backward(self):
        assert parse_problem("r256").kind == "r2c"
        assert parse_problem("rb256").kind == "c2r"

    def test_k_suffixes(self):
        assert parse_problem("c4k").sizes == (4096,)
        assert parse_problem("c1m").sizes == (1 << 20,)

    def test_r2r_kinds(self):
        p = parse_problem("k10e10x512o11")
        assert p.kind == "r2r"
        assert p.r2r_kinds == (K.Kind.REDFT10, K.Kind.RODFT11)
        assert p.sizes == (10, 512)

    def test_r2r_default_and_named(self):
        p = parse_problem("k128f")
        assert p.r2r_kinds == (K.Kind.R2HC,)
        p = parse_problem("k128h")
        assert p.r2r_kinds == (K.Kind.DHT,)

    def test_batch_vector(self):
        p = parse_problem("c1024v64")
        assert p.sizes == (1024,) and p.batch == (64,)
        assert p.shape == (64, 1024) and p.axes == (1,)

    def test_strides_rejected(self):
        with pytest.raises(UnsupportedProblem):
            parse_problem("c64:2")

    def test_logical_n_r2r(self):
        p = parse_problem("k8e00")            # DCT-I n=8 -> logical 2(n-1)
        assert p.r2r_kinds[0] == K.Kind.REDFT00
        assert p.logical_n == 14

    def test_mflops_convention(self):
        p = parse_problem("c1024")
        assert mflops(p, 1.0) == pytest.approx(5 * 1024 * 10 / 1e6)
        r = parse_problem("r1024")
        assert mflops(r, 1.0) == pytest.approx(2.5 * 1024 * 10 / 1e6)


class TestAcmp:
    def test_pass_and_fail(self):
        a = np.array([1.0, 2.0, 3.0])
        assert acmp(a, a + 1e-7, 1e-3) < 1e-3
        with pytest.raises(VerificationError):
            acmp(a, a + 1.0, 1e-3)


PROBLEMS = ["c64", "cb64", "c60", "c13", "ic128", "32x16", "r64", "r63",
            "rb64", "k64f", "k64b", "k64h", "k32e10x12e01", "k16o00",
            "c16v4", "k20e11", "k24o10", "k12o11"]


@pytest.mark.parametrize("pstring", PROBLEMS)
def test_verify_problem(pstring):
    res = verify_problem(pstring, rounds=2)
    assert res.max_err < 1e-3


def test_verify_double():
    res = verify_problem("c128", rounds=2, rdtype="float64")
    assert res.max_err < 1e-10


def test_verify_catches_bugs():
    """A deliberately broken transform must fail the battery."""
    from fftw3_tpu.harness import verify as V

    class BrokenClosure(V._Closure):
        def apply(self, x):
            y = super().apply(x)
            return y * 1.01          # 1% systematic error

    res = V.VerifyResult(problem="broken")
    rng = np.random.default_rng(0)
    cl = BrokenClosure(parse_problem("c64"), K.ESTIMATE, "float32")
    with pytest.raises(VerificationError):
        V._impulse(cl, rng, 2, 1e-3, res)


class TestParanoid:
    def test_paranoid_hook(self):
        from fftw3_tpu import api
        from fftw3_tpu.harness.paranoid import paranoid
        from fftw3_tpu.planner import the_planner

        the_planner.forget_wisdom()
        with paranoid() as seen:
            api.plan_dft((96,))       # 96 = 2^5*3: several subplans
        assert len(seen) >= 1
        assert all(err < 1e-3 for _, err in seen)

    def test_check_descriptor_catches(self):
        from fftw3_tpu.harness.paranoid import ParanoiaError, check_descriptor
        with pytest.raises((ParanoiaError, ValueError, TypeError)):
            check_descriptor("c2c", 8, {"alg": "direct", "n": 16})


def test_fuzz_bounded():
    """check.pl analog: a deterministic random-problem sweep stays green."""
    from fftw3_tpu.harness.fuzz import run_fuzz
    failures = run_fuzz(count=8, seed=42, maxsize=128,
                        patience_flags=K.ESTIMATE)
    assert failures == 0


def test_cli_verify_and_speed(capsys):
    from fftw3_tpu.harness.cli import main
    assert main(["-y", "c64", "-y", "r32", "-v", "1"]) == 0
    out = capsys.readouterr().out
    assert "c64" in out


def test_threads_shims():
    from fftw3_tpu import threads
    assert threads.init_threads() == 1
    threads.plan_with_nthreads(4)
    assert threads.planner_nthreads() == 4
    threads.make_planner_thread_safe()
    threads.cleanup_threads()
    assert threads.planner_nthreads() == 1


class TestAccuracy:
    def test_accuracy_columns(self):
        from fftw3_tpu.harness.accuracy import accuracy_test
        res = accuracy_test("c128")
        assert set(res.norms) == {"l1", "l2", "linf"}
        assert all(v < 1e-4 for v in res.norms.values()), res
        res64 = accuracy_test("c128", rdtype="float64")
        assert all(v < 1e-12 for v in res64.norms.values()), res64

    def test_accuracy_c2r_roundtrip(self):
        from fftw3_tpu.harness.accuracy import accuracy_test
        res = accuracy_test("rb64")
        assert all(v < 1e-4 for v in res.norms.values()), res

    def test_accuracy_r2r(self):
        from fftw3_tpu.harness.accuracy import accuracy_test
        res = accuracy_test("k64e10")
        assert all(v < 1e-4 for v in res.norms.values()), res

    def test_accuracy_cli(self, capsys):
        from fftw3_tpu.harness.accuracy import main
        assert main(["c64", "r32"]) == 0
        out = capsys.readouterr().out
        assert "linf" in out


def test_verify_batched_c2r():
    """Regression: batched c2r impulse expected a constant over ALL batch
    rows; only the delta-bearing entry is constant (found by fuzzing)."""
    res = verify_problem("orb229v8", rounds=2)
    assert res.max_err < 1e-3
    res = verify_problem("rb64v4", rounds=2)
    assert res.max_err < 1e-3


def test_cli_dist_verify_and_speed(capsys):
    """mpi-bench analog: --dist P runs -y/-s on the virtual mesh
    (fftw/mpi/mpi-bench.c role; VERDICT round-3 item 5)."""
    from fftw3_tpu.harness.cli import main
    assert main(["--dist", "8", "-y", "c1024", "-y", "64x32x16",
                 "-v", "1"]) == 0
    out = capsys.readouterr().out
    assert "six-step" in out and "slab" in out
    assert main(["--dist", "4", "-s", "c64x64"]) == 0
    out = capsys.readouterr().out
    assert "mflops" in out and "dist" in out


def test_cli_dist_verify_real_and_scrambled(capsys):
    from fftw3_tpu.harness.cli import main
    assert main(["--dist", "4", "-y", "r32x16x8", "-y", "rb64x32",
                 "-y", "tc4096", "-y", "k32e10x16o10"]) == 0
    out = capsys.readouterr().out
    assert "scrambled" in out


def test_cli_dist_rank1_real_rejected(capsys):
    from fftw3_tpu.harness.cli import main
    assert main(["--dist", "4", "-y", "r1024"]) == 1
