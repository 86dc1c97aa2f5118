"""Native blosc1/LZ4 codec (data/native/blosc.cc) and its zarr integration.

Golden-byte tests pin the container format from the public spec
(independent of our own encoder); round-trips cover shuffle/split/leftover
paths; zarr tests cover the external-default ``Blosc(cname='lz4',
shuffle=1)`` metadata end-to-end.
"""

import json
import os
import struct

import numpy as np
import pytest

from climate2weather_tpu.data import native_blosc

pytestmark = pytest.mark.skipif(
    not native_blosc.available(), reason="native blosc codec did not build"
)


def _header(flags, typesize, nbytes, blocksize, cbytes):
    return bytes([2, 1, flags, typesize]) + struct.pack(
        "<III", nbytes, blocksize, cbytes
    )


def test_golden_memcpy_chunk():
    """A pure-memcpy chunk: header + raw bytes, no offsets, no unshuffle."""
    payload = bytes(range(8))
    chunk = _header(0x2 | (1 << 5), 1, 8, 8, 16 + 8) + payload
    assert native_blosc.decompress(chunk) == payload


def test_golden_single_stream_lz4_chunk():
    """One unsplit block with a hand-built all-literals LZ4 stream."""
    payload = b"abcdefgh"
    stream = bytes([len(payload) << 4]) + payload  # token: 8 literals, no match
    # header | offsets[1] | [csize | stream]
    cbytes = 16 + 4 + 4 + len(stream)
    chunk = (
        _header(1 << 5, 1, len(payload), len(payload), cbytes)
        + struct.pack("<I", 20)
        + struct.pack("<I", len(stream))
        + stream
    )
    assert native_blosc.decompress(chunk) == payload


def test_golden_lz4_match_stream():
    """LZ4 match copy incl. the overlap rule (offset < matchlen)."""
    # 4 literals "abab", then a match offset=2 len=8 -> "abababababab"
    stream = bytes([0x40 | 0x04]) + b"abab" + struct.pack("<H", 2)
    payload = b"abab" + b"ab" * 4
    cbytes = 16 + 4 + 4 + len(stream)
    chunk = (
        _header(1 << 5, 1, len(payload), len(payload), cbytes)
        + struct.pack("<I", 20)
        + struct.pack("<I", len(stream))
        + stream
    )
    assert native_blosc.decompress(chunk) == payload


def test_unsupported_codec_clear_error():
    chunk = _header(4 << 5, 4, 64, 64, 16) + b"\x00" * 64
    with pytest.raises(ValueError, match="unsupported codec"):
        native_blosc.decompress(chunk)


def test_bitshuffle_clear_error():
    chunk = _header(0x4 | (1 << 5), 4, 64, 64, 16) + b"\x00" * 64
    with pytest.raises(ValueError, match="bit-shuffle"):
        native_blosc.decompress(chunk)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int16])
@pytest.mark.parametrize("shuffle", [True, False])
def test_roundtrip_compressible(dtype, shuffle):
    """Smooth fields (the weather case): multi-block, split streams."""
    rng = np.random.RandomState(0)
    x = np.cumsum(rng.randn(40000).astype(dtype))  # > one 32 KiB block
    raw = np.ascontiguousarray(x).tobytes()
    c = native_blosc.compress(raw, np.dtype(dtype).itemsize, shuffle=shuffle)
    if shuffle:
        assert len(c) < len(raw)  # byte-shuffle makes float fields compress
    assert native_blosc.decompress(c) == raw


def test_roundtrip_incompressible_falls_back_to_memcpy():
    raw = os.urandom(5000)
    c = native_blosc.compress(raw, 4, shuffle=True)
    assert len(c) == 16 + len(raw)  # memcpy chunk
    assert native_blosc.decompress(c) == raw


@pytest.mark.parametrize("n", [0, 1, 7, 127, 128, 4096, 32768, 32769, 100001])
def test_roundtrip_sizes(n):
    """Edge sizes: empty, sub-split-threshold, exact block, leftover block."""
    rng = np.random.RandomState(n or 1)
    raw = (np.arange(n, dtype=np.uint8) // 7 + rng.randint(0, 2, n)).astype(
        np.uint8
    ).tobytes()
    for typesize in (1, 4, 8):
        c = native_blosc.compress(raw, typesize, shuffle=True)
        assert native_blosc.decompress(c) == raw, (n, typesize)


def test_zarr_blosc_roundtrip(tmp_path):
    """write_zarr(compressor='blosc-lz4') -> read_zarr equality, with the
    numcodecs-style Blosc metadata external readers expect."""
    from climate2weather_tpu.data.grid import GridDataset
    from climate2weather_tpu.data.zarr_store import read_zarr, write_zarr

    rng = np.random.RandomState(3)
    t = 30
    time = np.datetime64("2014-01-01T00", "ns") + np.arange(t) * np.timedelta64(
        1, "h"
    )
    ds = GridDataset(
        {v: np.cumsum(rng.randn(t, 16, 16), axis=0).astype(np.float32)
         for v in ("psl", "tas")},
        {"time": time, "rlat": np.linspace(-2, 2, 16),
         "rlon": np.linspace(0, 4, 16)},
    )
    path = str(tmp_path / "store.zarr")
    write_zarr(ds, path, compressor="blosc-lz4")
    with open(os.path.join(path, "psl", ".zarray")) as f:
        meta = json.load(f)
    assert meta["compressor"] == {
        "id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
        "blocksize": 0,
    }
    back = read_zarr(path)
    for v in ("psl", "tas"):
        np.testing.assert_array_equal(back.data_vars[v], ds.data_vars[v])
    np.testing.assert_array_equal(back.time, ds.time)


def test_zarr_foreign_blosc_unsupported_cname_names_store(tmp_path):
    """A store whose chunks use an unsupported blosc codec fails with the
    store path and codec guidance in the message (ADVICE round-2)."""
    from climate2weather_tpu.data.zarr_store import read_zarr

    root = tmp_path / "foreign.zarr"
    adir = root / "x"
    adir.mkdir(parents=True)
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (adir / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [4, 2, 2], "chunks": [4, 2, 2],
        "dtype": "<f4",
        "compressor": {"id": "blosc", "cname": "zstd", "clevel": 5,
                       "shuffle": 1, "blocksize": 0},
        "fill_value": None, "order": "C", "filters": None,
    }))
    # zstd-coded chunk: flags codec id 4
    payload = b"\x00" * 64
    chunk = bytes([2, 1, 4 << 5, 4]) + struct.pack("<III", 64, 64, 16) + payload
    (adir / "0.0.0").write_bytes(chunk)
    with pytest.raises(ValueError, match="unsupported codec"):
        read_zarr(str(root))
