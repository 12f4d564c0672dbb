"""MatrixMarket I/O tests (reference L0: mmio.c banner/size/triplet
parsing, matrix_coo.cc loader semantics)."""

import io

import numpy as np
import pytest

from cgx.io import mmio
from cgx.mats.containers import COOMatrix, DenseMatrix
from cgx.mats.generators import lap2d_fd, lap2d_fd_coo_lower


def test_banner_parse():
    tc = mmio.read_banner("%%MatrixMarket matrix coordinate real symmetric")
    assert tc.is_matrix and tc.is_sparse and tc.is_real and tc.is_symmetric
    tc = mmio.read_banner("%%MatrixMarket matrix coordinate real general")
    assert tc.is_general and not tc.is_symmetric


@pytest.mark.parametrize(
    "bad",
    [
        "%%NotMatrixMarket matrix coordinate real general",
        "%%MatrixMarket tensor coordinate real general",
        "%%MatrixMarket matrix weird real general",
        "%%MatrixMarket matrix coordinate quaternion general",
        "%%MatrixMarket matrix coordinate real diagonal",
    ],
)
def test_banner_rejects(bad):
    with pytest.raises(mmio.MMIOError):
        mmio.read_banner(bad)


def test_sparse_roundtrip(tmp_path):
    rs = np.random.default_rng(0)
    n, nnz = 50, 200
    rows = rs.integers(0, n, nnz).astype(np.int32)
    cols = rs.integers(0, n, nnz).astype(np.int32)
    vals = rs.standard_normal(nnz)
    path = tmp_path / "t.mtx"
    mmio.mmwrite(path, (n, n), rows, cols, vals, symmetry="general", comment="test")
    data = mmio.mmread(path)
    assert data.shape == (n, n)
    assert data.nnz == nnz
    np.testing.assert_array_equal(data.rows, rows)
    np.testing.assert_array_equal(data.cols, cols)
    np.testing.assert_allclose(data.values, vals, rtol=0)  # .17g is exact


def test_symmetric_lower_triangle_convention(tmp_path):
    """The on-disk convention of the reference's lap2D_5pt_n100.mtx:
    symmetric banner + lower triangle stored; the dense container must
    mirror (matrix.cc:18-20)."""
    coo = lap2d_fd_coo_lower(4)  # 16x16
    path = tmp_path / "lap.mtx"
    coo.write(path, comment=" 2D 5-point Laplacian")
    back = COOMatrix.read(path)
    assert back.symmetric
    dense = DenseMatrix.read(path)
    expect = lap2d_fd(4).to_dense()
    np.testing.assert_array_equal(dense.a, expect)
    assert np.array_equal(dense.a, dense.a.T)
    # all stored entries are on/below the diagonal
    assert (back.rows >= back.cols).all()


def test_pattern_file():
    f = io.StringIO(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "%comment\n"
        "3 3 2\n"
        "1 1\n"
        "3 2\n"
    )
    data = mmio.mmread(f)
    assert data.typecode.is_pattern
    np.testing.assert_array_equal(data.rows, [0, 2])
    np.testing.assert_array_equal(data.cols, [0, 1])
    np.testing.assert_array_equal(data.values, [1.0, 1.0])


def test_dense_array_file():
    f = io.StringIO(
        "%%MatrixMarket matrix array real general\n"
        "2 3\n"
        "1\n4\n2\n5\n3\n6\n"
    )
    data = mmio.mmread(f)
    np.testing.assert_array_equal(data.dense, [[1, 2, 3], [4, 5, 6]])


def test_integer_field():
    f = io.StringIO(
        "%%MatrixMarket matrix coordinate integer general\n"
        "2 2 2\n"
        "1 1 7\n"
        "2 2 -3\n"
    )
    data = mmio.mmread(f)
    np.testing.assert_array_equal(data.values, [7.0, -3.0])


def test_out_of_bounds_rejected():
    f = io.StringIO(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 1\n"
        "3 1 1.0\n"
    )
    with pytest.raises(mmio.MMIOError):
        mmio.mmread(f)


def test_count_mismatch_rejected():
    f = io.StringIO(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 2\n"
        "1 1 1.0\n"
    )
    with pytest.raises(mmio.MMIOError):
        mmio.mmread(f)


def test_scipy_cross_check(tmp_path):
    scipy = pytest.importorskip("scipy")
    from scipy.io import mmread as scipy_mmread

    coo = lap2d_fd_coo_lower(6)
    path = tmp_path / "x.mtx"
    coo.write(path)
    ours = COOMatrix.read(path).to_dense()
    theirs = scipy_mmread(str(path)).toarray()
    np.testing.assert_array_equal(ours, theirs)


def test_skew_symmetric_rejected_by_container(tmp_path):
    """mmio parses skew files (typecode parity), but COOMatrix must
    refuse them: its mirror fill is +value and CG needs SPD."""
    p = tmp_path / "skew.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "3 3 2\n2 1 1.5\n3 2 -0.5\n"
    )
    d = mmio.mmread(p)
    assert d.typecode.is_skew  # the parser accepts it
    with pytest.raises(mmio.MMIOError, match="skew"):
        COOMatrix.read(p)


def test_mutation_fuzz_parsers_fail_cleanly(tmp_path):
    """Mutation fuzz over a valid .mtx: every corrupted variant must
    either parse or raise a clean Python exception from BOTH parsers —
    no crashes, no hangs, and no silent disagreement when both accept
    (the native C parser is the risky one: it scans a raw buffer)."""
    from cgx.io import mmio as pymm
    from cgx.io import native
    from cgx.mats.generators import lap2d_fd_coo_lower

    base_path = tmp_path / "base.mtx"
    lap2d_fd_coo_lower(6).write(str(base_path))
    base = base_path.read_bytes()
    rng = np.random.default_rng(0)
    mutations = []
    for _ in range(60):  # byte flips
        b = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(0, len(b))] = rng.integers(32, 127)
        mutations.append(bytes(b))
    for _ in range(20):  # truncations
        mutations.append(base[: rng.integers(0, len(base))])
    for _ in range(20):  # line drops / duplications
        lines = base.splitlines(keepends=True)
        i = rng.integers(0, len(lines))
        op = rng.integers(0, 2)
        mutated = lines[:i] + lines[i + 1:] if op == 0 else (
            lines[:i] + [lines[i]] + lines[i:]
        )
        mutations.append(b"".join(mutated))

    p = tmp_path / "fuzz.mtx"
    agree = disagree = 0
    for data in mutations:
        p.write_bytes(data)
        parsers = [pymm.mmread]
        if native.native_available():
            parsers.append(native.mmread_native)
        results = []
        for parser in parsers:
            try:
                results.append(parser(str(p)))
            except Exception:  # noqa: BLE001 — clean failure is the pass
                results.append(None)
        if len(results) == 1:
            continue
        a, b_ = results
        if a is not None and b_ is not None:
            ra, rb = a, b_
            va = ra.values if ra.values is not None else ra.dense
            vb = rb.values if rb.values is not None else rb.dense
            same = (
                ra.shape == rb.shape
                and np.shape(va) == np.shape(vb)
                and np.allclose(
                    np.sort(np.ravel(va)), np.sort(np.ravel(vb))
                )
            )
            if same:
                agree += 1
            else:
                disagree += 1
    # both parsers accepting the same bytes must mean the same matrix
    assert disagree == 0, f"{disagree} accepted-but-different mutations"
