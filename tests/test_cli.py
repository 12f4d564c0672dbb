"""CLI tests: both reference grammars, std::stoi parity, sharded mode
(reference L5: MPI/cg_main.cc + CUDA/cg_main.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx.cli import main as climod
from cgx.mats.generators import lap2d_fd_coo_lower


def test_mpi_grammar(tmp_path, capsys):
    out = tmp_path / "strong.txt"
    rc = climod.main(["256", str(out), "--format", "dia"])
    assert rc == 0
    row = out.read_text().strip().split(",")
    assert row[0] == "256" and row[1] == "1" and float(row[2]) > 0
    captured = capsys.readouterr().out
    assert "[STEP" in captured and "||Ax - b||/||b||" in captured


def test_mpi_grammar_maxiter(tmp_path, capsys):
    out = tmp_path / "weak.txt"
    rc = climod.main(["256", str(out), "50", "--format", "dia", "--tol", "0.0"])
    assert rc == 0
    assert "[STEP 50]" in capsys.readouterr().out


def test_cuda_grammar(tmp_path, capsys):
    mtx = tmp_path / "m.mtx"
    lap2d_fd_coo_lower(12).write(mtx)
    out = tmp_path / "cuda.txt"
    rc = climod.main([str(mtx), "1024", "16", "true", str(out)])
    assert rc == 0
    row = out.read_text().strip().split(",")
    assert row[0] == "1024" and row[1] == "16"
    assert "Time for CG" in capsys.readouterr().out


def test_stoi_parity():
    """The reference's cg.run passes '2,'-style tokens; std::stoi parses
    the leading digits (SURVEY §3.5 quirk)."""
    assert climod._stoi("1024,") == 1024
    assert climod._stoi("-3x") == -3
    with pytest.raises(ValueError):
        climod._stoi("x3")


def test_missing_args(tmp_path, capsys):
    mtx = tmp_path / "m.mtx"
    lap2d_fd_coo_lower(4).write(mtx)
    rc = climod.main([str(mtx), "8"])
    assert rc == 1
    assert "usage" in capsys.readouterr().err


def test_sharded_cli(tmp_path):
    out = tmp_path / "s.txt"
    rc = climod.main(["256", str(out), "--devices", "4", "--format", "dia"])
    assert rc == 0
    assert out.read_text().strip().split(",")[1] == "4"


@pytest.mark.parametrize("fmt", ["dense", "dia", "ell", "csr"])
def test_formats(tmp_path, fmt):
    out = tmp_path / f"{fmt}.txt"
    rc = climod.main(["128", str(out), "--format", fmt, "--tol", "1e-6"])
    assert rc == 0


def test_block_jacobi_flag(tmp_path, capsys):
    """--precond block_jacobi works single-device and sharded, with
    the block size validated against the shard size."""
    out = tmp_path / "bj.txt"
    rc = climod.main([
        "256", str(out), "--format", "dia",
        "--precond", "block_jacobi", "--precond-block-size", "16",
    ])
    assert rc == 0
    assert "[STEP" in capsys.readouterr().out
    rc = climod.main([
        "256", str(out), "--devices", "4", "--format", "dia",
        "--precond", "block_jacobi", "--precond-block-size", "16",
    ])
    assert rc == 0
