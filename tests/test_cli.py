"""CLI surface tests (run in-process on the CPU mesh)."""

import os

import numpy as np
import pytest

from tests.conftest import circuit_path


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _main(argv):
    from eig_kl_tpu.cli.main import main

    return main(argv)


class TestCli:
    def test_generate_and_kl(self, workdir, capsys):
        assert _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"]) == 0
        assert _main(["kl", "c.hgr"]) == 0
        out = capsys.readouterr().out
        assert "Verified cut size" in out
        assert os.path.exists("results/c.hgr_KL_CutSize_output.txt")

    def test_kl_multi_start(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--starts", "4"]) == 0
        out = capsys.readouterr().out
        assert "Multi-start best cuts" in out
        # best-of-4 must be at least as good as the seed-0 single start
        _main(["kl", "c.hgr"])

    def test_kl_multi_start_eig_perturbed(self, workdir, capsys):
        """-EIG + --starts runs spectral-seeded multi-start (start 0
        unperturbed, so best-of-N can only improve on the single -EIG
        run)."""
        import re

        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["eig", "c.hgr"]) == 0
        assert _main(["kl", "c.hgr", "-EIG"]) == 0
        single = float(
            re.search(r"Best cut size achieved\s*:\s*([\d.]+)",
                      capsys.readouterr().out).group(1)
        )
        assert _main(["kl", "c.hgr", "-EIG", "--starts", "4"]) == 0
        out = capsys.readouterr().out
        assert "Multi-start best cuts" in out
        multi = float(
            re.search(r"Best cut size achieved\s*:\s*([\d.]+)", out).group(1)
        )
        assert multi <= single + 1e-6

    def test_fused_multi_start(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["fused", "c.hgr", "-EIG", "--starts", "4",
                      "--passes", "2"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_kl_sharded(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--sharded"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_kl_sharded_honors_config(self, workdir, capsys):
        """--sharded must respect the user's KL flags (review finding:
        they were silently dropped)."""
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--sharded", "--gain-eps", "1e-6"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_kl_sharded_shuffled_ties(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--sharded", "--shuffled-ties"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_kl_passes(self, workdir, capsys):
        import re

        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--seed", "2"]) == 0
        single = float(
            re.search(r"Best cut size achieved\s*:\s*([\d.]+)",
                      capsys.readouterr().out).group(1)
        )
        assert _main(["kl", "c.hgr", "--seed", "2", "--passes", "0"]) == 0
        multi = float(
            re.search(r"Best cut size achieved\s*:\s*([\d.]+)",
                      capsys.readouterr().out).group(1)
        )
        assert multi <= single + 1e-6

    def test_kl_passes_multi_start(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--starts", "4", "--passes", "2"]) == 0
        assert "Multi-start best cuts" in capsys.readouterr().out

    def test_kl_passes_sharded(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--sharded", "--passes", "2"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_fused_power_iters(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["fused", "c.hgr", "-EIG", "--power-iters", "60"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_fused_lanczos_solver(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["fused", "c.hgr", "-EIG", "--solver", "lanczos"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_kl_table(self, workdir, capsys):
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--table"]) == 0
        assert "KL Iterations" in capsys.readouterr().out

    def test_eig_kl_roundtrip(self, workdir, capsys):
        assert _main(["eig", circuit_path("fract"), "--solver", "lanczos"]) == 0
        out = capsys.readouterr().out
        assert "lambda_2 = 0.254706743273" in out
        assert _main(["kl", circuit_path("fract"), "-EIG"]) == 0
        assert "Verified cut size" in capsys.readouterr().out

    def test_missing_file(self, workdir, capsys):
        assert _main(["kl", "nope.hgr"]) == 1
        assert "file not found" in capsys.readouterr().err

    def test_info(self, capsys):
        assert _main(["info"]) == 0
        assert "Device" in capsys.readouterr().out


class TestCliRound2:
    def test_matrix_stats_block(self, workdir, capsys):
        """The matrix-statistics block prints on every KL run
        (cKL.cpp:134-146)."""
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr"]) == 0
        out = capsys.readouterr().out
        assert "Matrix Statistics" in out
        assert "Non-zero" in out

    def test_table_time_column(self, workdir, capsys):
        """--table includes the per-swap Time(us) column
        (cKL.cpp:368-378)."""
        _main(["generate", "0.001", "-o", "c.hgr", "--seed", "1"])
        assert _main(["kl", "c.hgr", "--table"]) == 0
        out = capsys.readouterr().out
        assert "Time(us)" in out

    def test_eig_lobpcg_solver(self, workdir, capsys):
        assert (
            _main([
                "eig", circuit_path("fract"), "--solver", "lobpcg", "--f32",
            ])
            == 0
        )
        out = capsys.readouterr().out
        assert "lambda_2 = 0.254706" in out

    def test_eig_f32_refined_default_parity(self, workdir, capsys):
        """--f32 (the TPU default path) still hits the golden lambda_2
        thanks to the host refinement."""
        assert _main(["eig", circuit_path("fract"), "--f32"]) == 0
        out = capsys.readouterr().out
        assert "lambda_2 = 0.254706743" in out
