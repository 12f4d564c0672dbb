"""Native C++ MatrixMarket parser: build, parity with the Python
reader, error handling (reference L0 counterpart, mmio.c)."""

import io

import numpy as np
import pytest

from cgx.io import mmio as pymm
from cgx.io import native
from cgx.mats.generators import lap2d_fd_coo_lower

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native mmio library unavailable"
)


def test_parity_symmetric(tmp_path):
    coo = lap2d_fd_coo_lower(20)
    path = tmp_path / "lap.mtx"
    coo.write(path, comment=" test")
    a = pymm.mmread(path)
    b = native.mmread_native(path)
    assert a.shape == b.shape and a.nnz == b.nnz
    assert b.typecode.is_symmetric
    np.testing.assert_array_equal(a.rows, b.rows)
    np.testing.assert_array_equal(a.cols, b.cols)
    np.testing.assert_array_equal(a.values, b.values)


def test_parity_general_random(tmp_path):
    rs = np.random.default_rng(0)
    n, nnz = 64, 500
    rows = rs.integers(0, n, nnz).astype(np.int32)
    cols = rs.integers(0, n, nnz).astype(np.int32)
    vals = rs.standard_normal(nnz) * 10.0 ** rs.integers(-300, 300, nnz)
    path = tmp_path / "g.mtx"
    pymm.mmwrite(path, (n, n), rows, cols, vals)
    a = pymm.mmread(path)
    b = native.mmread_native(path)
    np.testing.assert_array_equal(a.rows, b.rows)
    np.testing.assert_array_equal(a.values, b.values)  # .17g round-trips


def test_pattern_and_integer(tmp_path):
    p1 = tmp_path / "p.mtx"
    p1.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n3 3 2\n1 1\n3 2\n"
    )
    d = native.mmread_native(p1)
    assert d.typecode.is_pattern
    np.testing.assert_array_equal(d.rows, [0, 2])
    np.testing.assert_array_equal(d.values, [1.0, 1.0])

    p2 = tmp_path / "i.mtx"
    p2.write_text(
        "%%MatrixMarket matrix coordinate integer general\n2 2 2\n1 1 7\n2 2 -3\n"
    )
    d = native.mmread_native(p2)
    np.testing.assert_array_equal(d.values, [7.0, -3.0])


def test_dense_array(tmp_path):
    p = tmp_path / "a.mtx"
    p.write_text("%%MatrixMarket matrix array real general\n2 3\n1\n4\n2\n5\n3\n6\n")
    d = native.mmread_native(p)
    np.testing.assert_array_equal(d.dense, [[1, 2, 3], [4, 5, 6]])


@pytest.mark.parametrize(
    "content,msg",
    [
        ("junk\n1 1 1\n", "banner"),
        ("%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 1.0\n", "truncated"),
        ("%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0\n", "bounds"),
        ("%%MatrixMarket matrix coordinate real general\n2 2 1\n1 1 zzz\n", "invalid"),
        ("%%MatrixMarket matrix coordinate real general\n2 2 1\n1 1 1.0\n9 9 9.0\n", "trailing"),
    ],
)
def test_errors(tmp_path, content, msg):
    p = tmp_path / "bad.mtx"
    p.write_text(content)
    with pytest.raises(pymm.MMIOError):
        native.mmread_native(p)


def test_native_writer_roundtrip(tmp_path):
    coo = lap2d_fd_coo_lower(10)
    path = tmp_path / "w.mtx"
    native.mmwrite_native(
        path, coo.shape, coo.rows, coo.cols, coo.values, symmetric=True, comment=" x"
    )
    back = pymm.mmread(path)
    assert back.typecode.is_symmetric
    np.testing.assert_array_equal(back.rows, coo.rows)
    np.testing.assert_array_equal(back.values, coo.values)


def test_auto_dispatch(tmp_path):
    """mmread_auto must agree with the python reader on either path."""
    coo = lap2d_fd_coo_lower(30)
    path = tmp_path / "auto.mtx"
    coo.write(path)
    d = native.mmread_auto(path)
    e = pymm.mmread(path)
    np.testing.assert_array_equal(d.rows, e.rows)
    np.testing.assert_array_equal(d.values, e.values)
