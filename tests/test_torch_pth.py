"""Torch-free .pth I/O (reference on-disk format, scene/dataset_mono.py:110-122).

Covers: writer->reader round-trip, interop with real torch in both directions
(skipped when torch is absent), loading the reference's shipped demo asset
(skipped when /root/reference is absent), and the code-execution guard.
"""

import io
import os
import pickle
import zipfile

import numpy as np
import pytest

from gaussianavatar_tpu.utils.torch_pth import load_pth, save_pth

torch = pytest.importorskip("torch", reason="interop tests need torch") if False else None
try:
    import torch  # noqa: F811
except ImportError:
    torch = None

REF_ASSET = "/root/reference/assets/test_pose/smpl_parms.pth"


def test_roundtrip(tmp_path):
    obj = {
        "beta": np.random.rand(1, 10).astype(np.float32),
        "body_pose": np.random.rand(480, 72).astype(np.float32),
        "trans": np.random.rand(480, 3).astype(np.float32),
        "nested": {"idx": np.arange(7, dtype=np.int64)},
    }
    p = str(tmp_path / "x.pth")
    save_pth(obj, p)
    back = load_pth(p)
    for k in ("beta", "body_pose", "trans"):
        np.testing.assert_array_equal(back[k], obj[k])
    np.testing.assert_array_equal(back["nested"]["idx"], obj["nested"]["idx"])


def test_bare_tensor_roundtrip(tmp_path):
    p = str(tmp_path / "mat.pth")
    a = np.random.rand(24, 4, 4).astype(np.float32)
    save_pth(a, p)
    np.testing.assert_array_equal(load_pth(p), a)


@pytest.mark.skipif(torch is None, reason="torch not installed")
def test_torch_reads_ours(tmp_path):
    obj = {"w": np.random.rand(3, 5).astype(np.float32)}
    p = str(tmp_path / "ours.pth")
    save_pth(obj, p)
    # weights_only=True is torch's restricted loader — our output must pass it
    t = torch.load(p, map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(t["w"].numpy(), obj["w"])


@pytest.mark.skipif(torch is None, reason="torch not installed")
def test_we_read_torch_zip_and_legacy(tmp_path):
    p1, p2 = str(tmp_path / "z.pth"), str(tmp_path / "leg.pth")
    x = torch.arange(24, dtype=torch.float32).reshape(2, 3, 4)
    torch.save({"x": x, "s": torch.tensor(2.5)}, p1)
    torch.save({"x": x}, p2, _use_new_zipfile_serialization=False)
    b1, b2 = load_pth(p1), load_pth(p2)
    np.testing.assert_array_equal(b1["x"], x.numpy())
    assert abs(float(np.asarray(b1["s"])) - 2.5) < 1e-7
    np.testing.assert_array_equal(np.asarray(b2["x"]).reshape(2, 3, 4), x.numpy())


@pytest.mark.skipif(torch is None, reason="torch not installed")
def test_noncontiguous_tensor(tmp_path):
    p = str(tmp_path / "nc.pth")
    x = torch.arange(24, dtype=torch.float32).reshape(4, 6).t()  # stride-swapped
    torch.save({"x": x}, p)
    np.testing.assert_array_equal(load_pth(p)["x"], x.numpy())


@pytest.mark.skipif(not os.path.exists(REF_ASSET), reason="reference asset absent")
def test_reads_reference_test_pose():
    d = load_pth(REF_ASSET)
    assert d["body_pose"].shape == (480, 72)
    assert d["trans"].shape == (480, 3)
    assert np.asarray(d["beta"]).reshape(-1).shape == (10,)
    assert np.isfinite(np.asarray(d["body_pose"])).all()


def test_refuses_arbitrary_globals(tmp_path):
    """A malicious .pth must not execute code: os.system is not allowlisted."""
    # hand-rolled: GLOBAL os.system, arg tuple ('true',), REDUCE
    evil = io.BytesIO(
        b"\x80\x02cos\nsystem\nX\x04\x00\x00\x00true\x85R."
    )
    p = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", evil.getvalue())
        zf.writestr("archive/version", "3\n")
    with pytest.raises(Exception, match="refuses|Unpickling"):
        load_pth(p)


def test_oob_tensor_metadata_rejected():
    """Corrupt/crafted size/stride must raise, not read out-of-bounds memory
    (the security contract in the module docstring)."""
    import pytest
    from gaussianavatar_tpu.utils.torch_pth import _rebuild_tensor_v2

    storage = (np.zeros(4, np.float32), np.dtype("<f4"))
    with pytest.raises(ValueError):
        _rebuild_tensor_v2(storage, 0, (1000000,), (1,))
    with pytest.raises(ValueError):
        _rebuild_tensor_v2(storage, 3, (2,), (1,))  # offset pushes past end
    with pytest.raises(ValueError):
        _rebuild_tensor_v2(storage, 0, (2, 2), (4, 1))  # stride escapes
    # valid metadata still works
    out = _rebuild_tensor_v2(storage, 0, (2, 2), (2, 1))
    assert out.shape == (2, 2)
    # zero-size tensors are fine
    assert _rebuild_tensor_v2(storage, 0, (0, 3), (3, 1)).shape == (0, 3)
