"""Dependency-free TensorBoard event writer.

Dashboard-compatible export replacing the reference's W&B logging
(/root/reference/cgan/cgan_train_enhanced.py:180-248,450-471 — per-epoch
``train/*`` / ``val/*`` / ``learning_rate/*`` scalars and
``wandb.watch(netG/netD, log='all')`` parameter/gradient histograms).
W&B's on-disk run format is a closed protobuf stream consumed only by
their client, so the portable equivalent is TensorBoard's event-file
format: every metric written here renders in stock ``tensorboard
--logdir`` (and uploads to W&B via ``wandb sync --tensorboard``).

The format is hand-encoded — zero TensorFlow dependency:

  TFRecord framing  = u64le payload length, masked CRC32C of the length
                      bytes, payload, masked CRC32C of the payload
                      (masked = ((crc>>15 | crc<<17) + 0xa282ead8) mod 2^32)
  payload           = tensorflow.Event proto:
                        1: double wall_time, 2: int64 step,
                        3: string file_version ("brain.Event:2", first
                           record only), 5: Summary
  Summary           = repeated Value (field 1)
  Summary.Value     = 1: string tag, 2: float simple_value,
                      4: HistogramProto
  HistogramProto    = 1..5: double min/max/num/sum/sum_squares,
                      6: packed double bucket_limit, 7: packed double bucket
"""

from __future__ import annotations

import struct
import time
from pathlib import Path
from typing import Iterable

import numpy as np

# ---------------------------------------------------------------- CRC32C

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- proto encoding

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _f_bytes(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _f_double(num: int, v: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", v)


def _f_float(num: int, v: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", v)


def _f_int64(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _packed_doubles(num: int, vals: Iterable[float]) -> bytes:
    payload = b"".join(struct.pack("<d", float(v)) for v in vals)
    return _f_bytes(num, payload)


def _histogram_proto(values: np.ndarray, bins: int = 30) -> bytes:
    v = np.asarray(values, np.float64).ravel()
    v = v[np.isfinite(v)]
    if v.size == 0:
        v = np.zeros(1)
    counts, edges = np.histogram(v, bins=bins)
    # TensorBoard convention: bucket_limit[i] is the *upper* edge of bucket i.
    msg = (
        _f_double(1, float(v.min()))
        + _f_double(2, float(v.max()))
        + _f_double(3, float(v.size))
        + _f_double(4, float(v.sum()))
        + _f_double(5, float(np.square(v).sum()))
        + _packed_doubles(6, edges[1:])
        + _packed_doubles(7, counts)
    )
    return msg


# ---------------------------------------------------------------- writer

class TBWriter:
    """Append-only tfevents writer; one file per run directory.

    Crash-safe like MetricsLogger: every record is flushed on write, and a
    truncated tail record is simply ignored by readers (TFRecord framing
    CRCs fail and the reader stops).
    """

    def __init__(self, logdir: str | Path):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        path = self.logdir / f"events.out.tfevents.{int(time.time())}.gcssl"
        self._f = path.open("ab")
        self.path = path
        self._write_event(_f_bytes(3, b"brain.Event:2"), wall_time=time.time())

    def _write_event(self, body: bytes, wall_time: float | None = None,
                     step: int | None = None) -> None:
        ev = _f_double(1, time.time() if wall_time is None else wall_time)
        if step is not None:
            ev += _f_int64(2, int(step))
        ev += body
        hdr = struct.pack("<Q", len(ev))
        self._f.write(hdr + struct.pack("<I", _masked_crc(hdr))
                      + ev + struct.pack("<I", _masked_crc(ev)))
        self._f.flush()

    def scalar(self, tag: str, value: float, step: int) -> None:
        val = _f_bytes(1, tag.encode()) + _f_float(2, float(value))
        self._write_event(_f_bytes(5, _f_bytes(1, val)), step=step)

    def scalars(self, record: dict, step: int, prefix: str = "") -> None:
        """One Summary event carrying every numeric entry of ``record``."""
        vals = b""
        for k, v in record.items():
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                continue
            if not np.isfinite(v):
                continue
            vals += _f_bytes(1, _f_bytes(1, (prefix + k).encode())
                             + _f_float(2, float(v)))
        if vals:
            self._write_event(_f_bytes(5, vals), step=step)

    def histogram(self, tag: str, values, step: int, bins: int = 30) -> None:
        val = _f_bytes(1, tag.encode()) + _f_bytes(
            4, _histogram_proto(np.asarray(values), bins)
        )
        self._write_event(_f_bytes(5, _f_bytes(1, val)), step=step)

    def watch(self, tree, step: int, prefix: str = "params") -> None:
        """``wandb.watch(log='all')`` analogue: per-leaf histograms of a
        (param or grad) pytree, tagged ``{prefix}/{path}``."""
        import jax

        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            name = "/".join(
                getattr(p, "key", getattr(p, "name", str(getattr(p, "idx", p))))
                for p in path
            )
            self.histogram(f"{prefix}/{name}", np.asarray(leaf), step)

    def close(self) -> None:
        self._f.close()


# ------------------------------------------------- reader (for tests/QA)

def read_events(path: str | Path) -> list[dict]:
    """Minimal decoder for the subset written above. Returns a list of
    {wall_time, step, scalars: {tag: value}, histograms: {tag: num}}."""
    out = []
    data = Path(path).read_bytes()
    off = 0
    while off + 12 <= len(data):
        (ln,) = struct.unpack_from("<Q", data, off)
        (lcrc,) = struct.unpack_from("<I", data, off + 8)
        if _masked_crc(data[off:off + 8]) != lcrc:
            break
        payload = data[off + 12:off + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + ln)
        if _masked_crc(payload) != pcrc:
            break
        off += 12 + ln + 4
        out.append(_decode_event(payload))
    return out


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        n |= (b[i] & 0x7F) << shift
        shift += 7
        i += 1
        if not b[i - 1] & 0x80:
            return n, i


def _iter_fields(b: bytes):
    i = 0
    while i < len(b):
        key, i = _read_varint(b, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(b, i)
        elif wire == 1:
            v = struct.unpack_from("<d", b, i)[0]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(b, i)
            v = b[i:i + ln]
            i += ln
        elif wire == 5:
            v = struct.unpack_from("<f", b, i)[0]
            i += 4
        else:  # pragma: no cover
            raise ValueError(f"wire type {wire}")
        yield num, wire, v


def _decode_event(payload: bytes) -> dict:
    ev = {"wall_time": None, "step": 0, "scalars": {}, "histograms": {}}
    for num, _w, v in _iter_fields(payload):
        if num == 1:
            ev["wall_time"] = v
        elif num == 2:
            ev["step"] = v
        elif num == 3:
            ev["file_version"] = v.decode()
        elif num == 5:
            for vnum, _vw, vv in _iter_fields(v):
                if vnum != 1:
                    continue
                tag, simple, histo = None, None, None
                for fnum, _fw, fv in _iter_fields(vv):
                    if fnum == 1:
                        tag = fv.decode()
                    elif fnum == 2:
                        simple = fv
                    elif fnum == 4:
                        histo = fv
                if tag is not None and simple is not None:
                    ev["scalars"][tag] = simple
                if tag is not None and histo is not None:
                    for hnum, _hw, hv in _iter_fields(histo):
                        if hnum == 3:
                            ev["histograms"][tag] = hv
    return ev
