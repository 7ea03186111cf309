"""MP4 / ISO Base Media File Format (ISO/IEC 14496-12) metadata extraction.

The video analog of the image/audio decode paths (reference:
pkg/domain/model/schema.go's opaque payload column + typed metadata —
hatchery carries bytes, the schema describes them): real container
parsing over an opaque `binary` column.  A 100 TB video corpus is
triaged by CONTAINER metadata (duration, track layout, resolution)
long before any codec runs — that walk is pure byte arithmetic this
module implements in full, from the public spec only:

  * box framing: u32 size + fourcc, size==1 → u64 largesize,
    size==0 → box extends to end of file (§4.2)
  * `ftyp` major/compatible brands (§4.3)
  * `moov`/`trak`/`mdia` container recursion (§8.1)
  * `mvhd` movie header v0/v1: timescale + duration (§8.2.2)
  * `tkhd` track header v0/v1: 16.16 fixed-point width/height (§8.3.2)
  * `hdlr` handler: 'vide'/'soun' track typing (§8.4.3)
  * unknown boxes (`free`, `skip`, `udta`, …) skipped by size, never
    parsed — forward-compatible with any writer

Codec payloads (the `mdat` bitstream) stay behind `DecoderUnavailable`
exactly like arithmetic-coded JPEG: sample DECODE needs an H.264/AAC
implementation this sandbox does not ship, and faking pixels would
poison a curation pipeline. Everything a metadata triage needs is real.

Deterministic encoders (`encode_mp4`) exist for fixtures: closed-form
durations/dimensions make every extracted value oracle-replayable.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .multimodal import DecoderUnavailable


def _box(fourcc: bytes, payload: bytes, largesize: bool = False) -> bytes:
    """Frame `payload` as a box. largesize=True exercises the 64-bit size
    branch (size field == 1, u64 follows the fourcc — §4.2)."""
    if largesize:
        return struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(version: int, flags: int = 0) -> bytes:
    return struct.pack(">B", version) + struct.pack(">I", flags)[1:]


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    t = ">QQIQ" if version else ">IIII"
    body = _full(version) + struct.pack(t, 0, 0, timescale, duration)
    # rate 1.0 (16.16), volume 1.0 (8.8), 10 reserved bytes, unity matrix,
    # 6×u32 pre_defined, next_track_ID
    body += struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
    body += b"\x00" * 10
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 99)
    return _box(b"mvhd", body)


def _tkhd(version: int, track_id: int, duration: int, width: float, height: float) -> bytes:
    t = ">QQIIQ" if version else ">IIIII"
    body = _full(version, 7) + struct.pack(t, 0, 0, track_id, 0, duration)
    body += struct.pack(">II", 0, 0)  # reserved
    body += struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt_group, volume, reserved
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += struct.pack(">II", int(width * 65536), int(height * 65536))
    return _box(b"tkhd", body)


def _mdhd(version: int, timescale: int, duration: int) -> bytes:
    t = ">QQIQ" if version else ">IIII"
    # language 'und' packed 5-bit (§8.4.2), pre_defined
    return _box(b"mdhd", _full(version) + struct.pack(t, 0, 0, timescale, duration)
                + struct.pack(">HH", 0x55C4, 0))


def _hdlr(handler: bytes, name: bytes = b"hatchery") -> bytes:
    return _box(b"hdlr", _full(0) + struct.pack(">I", 0) + handler
                + b"\x00" * 12 + name + b"\x00")


def encode_mp4(
    major_brand: str,
    timescale: int,
    duration: int,
    tracks: list[tuple[str, float, float]],
    largesize_mdat: bool = False,
    free_box: bool = False,
    mdat: bytes = b"\x00" * 32,
    versions: int = 0,
) -> bytes:
    """Minimal deterministic ISO BMFF writer for fixtures. `tracks` is a
    list of (handler 'vide'|'soun', width, height) — audio tracks carry
    0×0. versions=1 exercises the 64-bit mvhd/tkhd/mdhd fields."""
    trak_boxes = b""
    for tid, (handler, w, h) in enumerate(tracks, start=1):
        mdia = _box(b"mdia", _mdhd(versions, timescale, duration)
                    + _hdlr(handler.encode("ascii")))
        trak_boxes += _box(b"trak", _tkhd(versions, tid, duration, w, h) + mdia)
    moov = _box(b"moov", _mvhd(versions, timescale, duration) + trak_boxes)
    out = _box(b"ftyp", major_brand.encode("ascii") + struct.pack(">I", 0)
               + b"isom" + b"mp42")
    if free_box:
        out += _box(b"free", b"\x00" * 24)
    out += moov + _box(b"mdat", mdat, largesize=largesize_mdat)
    return out


@dataclass
class Mp4Meta:
    major_brand: str | None = None
    timescale: int | None = None
    duration: int | None = None
    video_tracks: int = 0
    audio_tracks: int = 0
    other_tracks: int = 0
    width: float | None = None
    height: float | None = None
    _cur_handler: list[str] = field(default_factory=list)
    _cur_dims: list[tuple[float, float]] = field(default_factory=list)

    @property
    def n_tracks(self) -> int:
        return self.video_tracks + self.audio_tracks + self.other_tracks

    @property
    def duration_sec(self) -> float | None:
        if self.timescale and self.duration is not None:
            return self.duration / self.timescale
        return None


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _walk(buf: bytes, start: int, end: int, meta: Mp4Meta, depth: int = 0) -> None:
    """Iterate sibling boxes in buf[start:end]; recurse into containers.
    Strict framing: a box whose declared size overruns its parent is a
    corrupt file, not a soft stop — curation must not half-trust metadata."""
    if depth > 16:
        raise ValueError("box nesting too deep")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        (size,) = struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing scope (§4.2)
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {fourcc!r} overruns parent")
        _read_box(buf, fourcc, body, pos + size, meta, depth)
        pos += size


def _read_box(buf: bytes, fourcc: bytes, body: int, box_end: int, meta: Mp4Meta, depth: int) -> None:
    if fourcc == b"ftyp":
        meta.major_brand = buf[body : body + 4].decode("ascii", "replace")
    elif fourcc in _CONTAINERS:
        if fourcc == b"trak":
            meta._cur_handler.clear()
            meta._cur_dims.clear()
        _walk(buf, body, box_end, meta, depth + 1)
        if fourcc == b"trak":
            h = meta._cur_handler[0] if meta._cur_handler else ""
            if h == "vide":
                meta.video_tracks += 1
                if meta._cur_dims:
                    w, hh = meta._cur_dims[0]
                    meta.width = max(meta.width or 0.0, w)
                    meta.height = max(meta.height or 0.0, hh)
            elif h == "soun":
                meta.audio_tracks += 1
            else:
                meta.other_tracks += 1
    elif fourcc == b"mvhd":
        version = buf[body]
        if version:
            _, _, ts, dur = struct.unpack_from(">QQIQ", buf, body + 4)
        else:
            _, _, ts, dur = struct.unpack_from(">IIII", buf, body + 4)
        meta.timescale, meta.duration = ts, dur
    elif fourcc == b"tkhd":
        version = buf[body]
        # width/height are the LAST 8 bytes of the box (16.16 fixed)
        w, h = struct.unpack_from(">II", buf, box_end - 8)
        meta._cur_dims.append((w / 65536.0, h / 65536.0))
    elif fourcc == b"hdlr":
        meta._cur_handler.append(buf[body + 8 : body + 12].decode("ascii", "replace"))
    # every other leaf box (mdat, free, skip, mdhd, …) is skipped by size


def parse_mp4_meta(content: bytes) -> Mp4Meta:
    """Parse container metadata from an ISO BMFF payload. Raises ValueError
    on corrupt framing, DecoderUnavailable when the payload is not BMFF at
    all (so callers keep the honest three-way ok/unavailable/error split)."""
    if len(content) < 12 or content[4:8] not in (b"ftyp", b"moov", b"free", b"skip", b"wide"):
        raise DecoderUnavailable("not an ISO BMFF payload")
    meta = Mp4Meta()
    _walk(content, 0, len(content), meta)
    if meta.timescale is None:
        raise ValueError("no moov/mvhd box")
    return meta
