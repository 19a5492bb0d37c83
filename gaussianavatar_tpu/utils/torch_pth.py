"""Torch-free reader/writer for torch-zip ``.pth`` checkpoints.

The reference's entire on-disk parameter format is torch-serialized
(`/root/reference/scene/dataset_mono.py:110-122` reads ``smpl_parms.pth``;
``assets/test_pose/smpl_parms.pth`` ships 480 demo poses;
``gen_pose_map_cano_smpl.py:68-70`` writes ``smpl_cano_joint_mat.pth``).
A modern torch checkpoint is just a ZIP archive::

    archive/data.pkl      pickle of the object graph; tensors are
                          torch._utils._rebuild_tensor_v2(storage, offset,
                          size, stride, requires_grad, hooks) calls whose
                          storages are pickle *persistent ids*
                          ('storage', <StorageType>, key, location, numel)
    archive/data/<key>    the raw little-endian element bytes per storage
    archive/version       serialization format version ("3")

so reading it needs only ``zipfile`` + a restricted ``pickle.Unpickler`` whose
``persistent_load`` maps storages to numpy arrays — no torch import. Writing
emits the same structure with hand-rolled pickle opcodes (the schema is tiny),
producing files ``torch.load(..., weights_only=True)`` accepts.

Security: ``find_class`` is an allowlist (tensor rebuilders, containers,
numpy scalars). Anything else raises — a ``.pth`` from the wild cannot run
code through this loader, unlike ``torch.load(weights_only=False)``.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

# torch storage class name -> numpy dtype (all little-endian on disk)
_STORAGE_DTYPES: Dict[str, np.dtype] = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": np.dtype("<u2"),  # no numpy bf16; exposed as uint16 bits
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}

# reverse map for the writer
_DTYPE_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


class _StorageType:
    """Stand-in for torch.<X>Storage inside persistent ids."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]


class _DTypeTag:
    """Stand-in for torch.float32-style dtype globals (appear in some files)."""

    def __init__(self, name: str):
        self.name = name


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    arr, dtype = storage
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    storage_offset = int(storage_offset)
    flat = arr[storage_offset:]
    if len(size) == 0:
        if flat.size < 1:
            raise ValueError("tensor metadata reaches past its storage")
        return flat[:1].reshape(())[()]
    # bounds check BEFORE as_strided: a corrupt/crafted file whose size/stride
    # exceed the storage would otherwise read out-of-bounds process memory
    # (also catches honestly-truncated archives, where frombuffer silently
    # yields fewer elements than numel claimed)
    max_index = sum((s - 1) * st for s, st in zip(size, stride) if s > 0)
    if any(s < 0 for s in size) or any(st < 0 for st in stride):
        raise ValueError("negative tensor size/stride")
    if 0 in size:
        return np.zeros(size, dtype)
    if max_index >= flat.size:
        raise ValueError(
            f"tensor metadata (size {size}, stride {stride}, offset "
            f"{storage_offset}) reaches past its storage ({arr.size} elems)"
        )
    strides_bytes = tuple(s * dtype.itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(flat, shape=size, strides=strides_bytes)
    return np.ascontiguousarray(view)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


# numpy >= 2 moved np.core to np._core (accessing the old name warns)
_np_multiarray = getattr(np, "_core", getattr(np, "core", np)).multiarray

_ALLOWED_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): OrderedDict,
    ("numpy", "ndarray"): np.ndarray,
    ("numpy", "dtype"): np.dtype,
    ("numpy.core.multiarray", "_reconstruct"): getattr(
        _np_multiarray, "_reconstruct", None
    ),
    ("numpy.core.multiarray", "scalar"): getattr(_np_multiarray, "scalar", None),
    ("numpy._core.multiarray", "_reconstruct"): getattr(
        _np_multiarray, "_reconstruct", None
    ),
    ("numpy._core.multiarray", "scalar"): getattr(_np_multiarray, "scalar", None),
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, read_storage):
        super().__init__(file, encoding="latin1")
        self._read_storage = read_storage

    def find_class(self, module, name):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name.startswith(("float", "int", "uint", "bfloat", "bool", "half", "double", "long", "short")):
            return _DTypeTag(name)
        fn = _ALLOWED_GLOBALS.get((module, name))
        if fn is not None:
            return fn
        raise pickle.UnpicklingError(
            f"torch_pth refuses to load global '{module}.{name}' — only plain "
            "tensor checkpoints are supported (no arbitrary code execution)"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and len(pid) >= 5 and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = storage_type.dtype
        raw = self._read_storage(str(key), int(numel) * dtype.itemsize)
        return np.frombuffer(raw, dtype=dtype), dtype


def load_pth(path: str) -> Any:
    """Load a torch-zip ``.pth`` file into numpy (dicts stay dicts, tensors
    become ``np.ndarray``). Also accepts legacy non-zip torch files saved
    with ``_use_new_zipfile_serialization=False``."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] != b"PK":
        return _load_legacy(path)

    with zipfile.ZipFile(path) as zf:  # closes even when unpickling raises
        names = zf.namelist()
        pkl_names = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl_names:
            raise ValueError(f"{path}: no data.pkl — not a torch-zip checkpoint")
        pkl_name = pkl_names[0]
        prefix = pkl_name[: -len("data.pkl")]

        def read_storage(key: str, nbytes: int) -> bytes:
            return zf.read(f"{prefix}data/{key}")[:nbytes]

        return _Unpickler(io.BytesIO(zf.read(pkl_name)), read_storage).load()


def _load_legacy(path: str) -> Any:
    """Legacy (pre-1.6) torch format: MAGIC, protocol, sysinfo pickles, the
    payload pickle, the storage-key list pickle, then per-storage
    ``<int64 numel><raw bytes>`` blobs."""
    class _Holder:
        def __init__(self, key, dtype):
            self.key, self.dtype = key, dtype

    class _Pending:
        def __init__(self, holder, offset, size, stride):
            self.holder, self.offset = holder, offset
            self.size, self.stride = size, stride

    def pending_rebuild(storage, storage_offset, size, stride, *a, **k):
        return _Pending(storage, int(storage_offset), tuple(size), tuple(stride))

    class LegacyUnpickler(_Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name in (
                "_rebuild_tensor_v2", "_rebuild_tensor"
            ):
                return pending_rebuild
            return super().find_class(module, name)

        def persistent_load(self, pid):
            if isinstance(pid, tuple) and pid[0] == "storage":
                storage_type, key = pid[1], pid[2]
                return _Holder(str(key), storage_type.dtype)
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")

    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != 0x1950A86A20F9469CFC6C:
            raise ValueError(f"{path}: not a torch legacy file (magic {magic:#x})")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info

        result = LegacyUnpickler(f, None).load()
        keys = pickle.load(f, encoding="latin1")
        holders: Dict[str, _Holder] = {}

        def collect(obj):
            if isinstance(obj, _Pending):
                holders[obj.holder.key] = obj.holder
            elif isinstance(obj, _Holder):
                holders[obj.key] = obj
            elif isinstance(obj, dict):
                for v in obj.values():
                    collect(v)
            elif isinstance(obj, (list, tuple)):
                for v in obj:
                    collect(v)

        collect(result)
        storages: Dict[str, np.ndarray] = {}
        for key in keys:
            (numel,) = struct.unpack("<q", f.read(8))
            dtype = holders[str(key)].dtype
            raw = f.read(numel * dtype.itemsize)
            storages[str(key)] = np.frombuffer(raw, dtype=dtype)

    def resolve(obj):
        if isinstance(obj, _Pending):
            return _rebuild_tensor_v2(
                (storages[obj.holder.key], obj.holder.dtype),
                obj.offset, obj.size, obj.stride,
            )
        if isinstance(obj, _Holder):
            return storages[obj.key]
        if isinstance(obj, dict):
            return type(obj)((k, resolve(v)) for k, v in obj.items())
        if isinstance(obj, (list, tuple)):
            return type(obj)(resolve(v) for v in obj)
        return obj

    return resolve(result)


# ---------------------------------------------------------------- writer ----

def _pickle_str(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    out += b"X" + struct.pack("<I", len(b)) + b


def _pickle_int(out: bytearray, v: int) -> None:
    if 0 <= v < 256:
        out += b"K" + struct.pack("<B", v)
    elif 0 <= v < 65536:
        out += b"M" + struct.pack("<H", v)
    elif -(2**31) <= v < 2**31:
        out += b"J" + struct.pack("<i", v)
    else:
        enc = v.to_bytes((v.bit_length() + 8) // 8, "little", signed=True)
        out += b"\x8a" + struct.pack("<B", len(enc)) + enc


def _pickle_global(out: bytearray, module: str, name: str) -> None:
    out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"


def _pickle_tensor(out: bytearray, key: str, arr: np.ndarray) -> None:
    storage_name = _DTYPE_STORAGE[arr.dtype]
    _pickle_global(out, "torch._utils", "_rebuild_tensor_v2")
    out += b"("  # outer args MARK
    out += b"("  # pid MARK
    _pickle_str(out, "storage")
    _pickle_global(out, "torch", storage_name)
    _pickle_str(out, key)
    _pickle_str(out, "cpu")
    _pickle_int(out, arr.size)
    out += b"t"  # pid tuple
    out += b"Q"  # BINPERSID
    _pickle_int(out, 0)  # storage offset
    out += b"("
    for s in arr.shape:
        _pickle_int(out, int(s))
    out += b"t"  # size
    out += b"("
    strides = []
    acc = 1
    for s in reversed(arr.shape):
        strides.append(acc)
        acc *= int(s)
    for s in reversed(strides):
        _pickle_int(out, s)
    out += b"t"  # contiguous stride
    out += b"\x89"  # requires_grad = False
    _pickle_global(out, "collections", "OrderedDict")
    out += b")R"  # backward_hooks = OrderedDict()
    out += b"t"  # close outer args
    out += b"R"  # REDUCE -> tensor


def save_pth(obj: Any, path: str) -> None:
    """Write ``obj`` as a torch-zip ``.pth`` readable by
    ``torch.load(..., weights_only=True)`` and by :func:`load_pth`.
    ``obj`` may be a numpy array or a (nested) dict of arrays/scalars."""
    storages: list = []

    def emit(out: bytearray, o: Any) -> None:
        if isinstance(o, np.ndarray):
            o = np.ascontiguousarray(o)
            if o.dtype not in _DTYPE_STORAGE:
                raise TypeError(f"unsupported dtype {o.dtype}")
            key = str(len(storages))
            storages.append(o)
            _pickle_tensor(out, key, o)
        elif isinstance(o, (np.floating, float)):
            emit(out, np.asarray(o, np.float32).reshape(1))
        elif isinstance(o, (np.integer, int)):
            emit(out, np.asarray(o, np.int64).reshape(1))
        elif isinstance(o, dict):
            out += b"}("
            for k, v in o.items():
                _pickle_str(out, str(k))
                emit(out, v)
            out += b"u"  # SETITEMS
        elif isinstance(o, (list, tuple)):
            out += b"("
            for v in o:
                emit(out, v)
            out += b"t" if isinstance(o, tuple) else b"l"
        else:
            raise TypeError(f"save_pth cannot serialize {type(o)}")

    body = bytearray(b"\x80\x02")  # PROTO 2
    emit(body, obj)
    body += b"."

    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bytes(body))
        for i, arr in enumerate(storages):
            zf.writestr(f"archive/data/{i}", arr.tobytes())
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")
    os.replace(tmp, path)


def load_pth_numpy(path: str) -> Dict[str, np.ndarray]:
    """Load and coerce every leaf to ``np.ndarray`` (scalars become 0-d)."""
    obj = load_pth(path)

    def conv(o):
        if isinstance(o, dict):
            return {k: conv(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return type(o)(conv(v) for v in o)
        return np.asarray(o)

    return conv(obj)
