"""Native C++ PCD parser vs the pure-Python golden implementation."""

import struct

import numpy as np
import pytest

from virus_nerf_tpu.utils.native import (
    load_pcd_native,
    native_available,
    save_pcd_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native library not built / no compiler"
)


def _python_load(path):
    """Force the pure-Python parser (bypass native dispatch)."""
    from virus_nerf_tpu.data import pcl as pclmod
    from unittest import mock

    with mock.patch(
        "virus_nerf_tpu.utils.native.load_pcd_native", lambda p: None
    ):
        return pclmod.load_pcd(path)


@needs_native
class TestNativePCD:
    def test_binary_matches_python(self, tmp_path, rng):
        from virus_nerf_tpu.data.pcl import save_pcd

        xyz = rng.normal(size=(1000, 3)).astype(np.float32)
        p = str(tmp_path / "c.pcd")
        save_pcd(p, xyz, binary=True)
        nat = load_pcd_native(p)
        py = _python_load(p)
        np.testing.assert_allclose(nat, py)
        np.testing.assert_allclose(nat, xyz, rtol=1e-6)

    def test_ascii_matches_python(self, tmp_path, rng):
        from virus_nerf_tpu.data.pcl import save_pcd

        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "a.pcd")
        save_pcd(p, xyz, binary=False)
        np.testing.assert_allclose(
            load_pcd_native(p), _python_load(p), rtol=1e-5
        )

    def test_extra_fields_and_types(self, tmp_path):
        # binary PCD with intensity (float) + ring (uint16) fields
        n = 16
        header = (
            "VERSION 0.7\nFIELDS x y z intensity ring\n"
            "SIZE 4 4 4 4 2\nTYPE F F F F U\nCOUNT 1 1 1 1 1\n"
            f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA binary\n"
        )
        rows = []
        for i in range(n):
            rows.append(
                struct.pack("<ffffH", i * 1.0, i * 2.0, i * 3.0, 9.0, i)
            )
        p = tmp_path / "mixed.pcd"
        with open(p, "wb") as f:
            f.write(header.encode())
            f.write(b"".join(rows))
        out = load_pcd_native(str(p))
        want = np.stack(
            [np.arange(n), 2.0 * np.arange(n), 3.0 * np.arange(n)], 1
        )
        np.testing.assert_allclose(out, want)

    def test_binary_compressed(self, tmp_path, rng):
        """Round-trip via the Python LZF compressor's inverse: craft a
        binary_compressed file with an uncompressed-equivalent LZF stream
        (literal runs only) and check both parsers agree."""
        n = 64
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        # column-major payload
        raw = b"".join(xyz[:, i].tobytes() for i in range(3))
        # LZF stream of literal runs (<=32 bytes each)
        comp = bytearray()
        for i in range(0, len(raw), 32):
            chunk = raw[i : i + 32]
            comp.append(len(chunk) - 1)
            comp += chunk
        header = (
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            f"COUNT 1 1 1\nWIDTH {n}\nHEIGHT 1\n"
            f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary_compressed\n"
        )
        p = tmp_path / "comp.pcd"
        with open(p, "wb") as f:
            f.write(header.encode())
            f.write(struct.pack("<II", len(comp), len(raw)))
            f.write(bytes(comp))
        nat = load_pcd_native(str(p))
        py = _python_load(str(p))
        np.testing.assert_allclose(nat, xyz, rtol=1e-6)
        np.testing.assert_allclose(py, xyz, rtol=1e-6)

    def test_native_save(self, tmp_path, rng):
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        p = str(tmp_path / "s.pcd")
        assert save_pcd_native(p, xyz, binary=True)
        np.testing.assert_allclose(load_pcd_native(p), xyz)

    def test_missing_file_raises(self):
        with pytest.raises(ValueError):
            load_pcd_native("/does/not/exist.pcd")
