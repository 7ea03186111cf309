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

Beyond metadata, the SAMPLE TABLES (§8.5–8.7) are parsed in full —
`stsd` (codec fourcc + declared dimensions), `stts` (run-length decode
deltas), `stsc` (sample→chunk runs), `stsz`/`co64`/`stco` (sizes and
chunk offsets) — reconstructing every sample's absolute byte range and
decode timestamp. For Motion-JPEG tracks (sample entry 'jpeg', the
QuickTime/ffmpeg MJPEG-in-MP4 form) each sample IS a complete JPEG
payload, so the in-repo T.81 decoder (functions/jpeg.py) turns the MP4
into real decoded video frames. Compressed codec payloads (H.264/AAC
bitstreams) stay behind `DecoderUnavailable` exactly like SOF11 JPEG:
faking pixels would poison a curation pipeline.

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


def _visual_sample_entry(codec: bytes, width: int, height: int) -> bytes:
    """VisualSampleEntry (§12.1.3): SampleEntry header + declared pixel
    dimensions. 'jpeg' is the QuickTime/ffmpeg Motion-JPEG entry — each
    sample is a complete T.81 JPEG payload, no decoder config box needed."""
    body = b"\x00" * 6 + struct.pack(">H", 1)          # SampleEntry: dref idx
    body += struct.pack(">HH", 0, 0) + struct.pack(">3I", 0, 0, 0)
    body += struct.pack(">HH", width, height)
    body += struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi 16.16
    body += struct.pack(">I", 0) + struct.pack(">H", 1)  # reserved, frame_count
    body += b"\x00" * 32                                 # compressorname
    body += struct.pack(">Hh", 0x0018, -1)               # depth, pre_defined
    return _box(codec, body)


def _rle_stts(durations: list[int]) -> bytes:
    runs: list[tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    body = _full(0) + struct.pack(">I", len(runs))
    for count, delta in runs:
        body += struct.pack(">II", count, delta)
    return _box(b"stts", body)


def _rle_stsc(chunking: list[int]) -> bytes:
    """stsc run-length form (§8.7.4): entries fire at first_chunk and hold
    until the next entry's first_chunk."""
    entries: list[tuple[int, int]] = []
    for c, spc in enumerate(chunking, start=1):
        if not entries or entries[-1][1] != spc:
            entries.append((c, spc))
    body = _full(0) + struct.pack(">I", len(entries))
    for first, spc in entries:
        body += struct.pack(">III", first, spc, 1)
    return _box(b"stsc", body)


def encode_mp4_video(
    samples: list[bytes],
    durations: list[int],
    timescale: int,
    width: int,
    height: int,
    codec: str = "jpeg",
    chunking: list[int] | None = None,
    co64: bool = False,
    versions: int = 0,
    uniform_stsz: bool = False,
) -> bytes:
    """Deterministic single-video-track MP4 with REAL sample tables.

    `samples` are the per-frame codec payloads (for codec='jpeg', complete
    JPEG bytes); `durations` are per-sample decode deltas in `timescale`
    units; `chunking` groups consecutive samples into mdat chunks (default
    one chunk) — multi-entry stsc/stco layouts for the parser to undo.
    mdat is written BEFORE moov so stco carries real absolute offsets
    (the standard non-faststart layout)."""
    n = len(samples)
    assert len(durations) == n
    chunking = chunking or [n]
    assert sum(chunking) == n and all(c > 0 for c in chunking)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom" + b"mp42")
    mdat_payload = b"".join(samples)
    # absolute offset of sample 0 = ftyp + mdat header (8 bytes)
    base = len(ftyp) + 8
    chunk_offsets, pos, s = [], base, 0
    for spc in chunking:
        chunk_offsets.append(pos)
        pos += sum(len(samples[s + k]) for k in range(spc))
        s += spc

    stsd = _box(b"stsd", _full(0) + struct.pack(">I", 1)
                + _visual_sample_entry(codec.encode("ascii"), width, height))
    if uniform_stsz:
        assert len({len(x) for x in samples}) == 1, "uniform stsz needs equal sizes"
        stsz = _box(b"stsz", _full(0) + struct.pack(">II", len(samples[0]), n))
    else:
        stsz = _box(b"stsz", _full(0) + struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(x)) for x in samples))
    if co64:
        stco = _box(b"co64", _full(0) + struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">Q", o) for o in chunk_offsets))
    else:
        stco = _box(b"stco", _full(0) + struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl = _box(b"stbl", stsd + _rle_stts(durations) + _rle_stsc(chunking)
                + stsz + stco)
    vmhd = _box(b"vmhd", _full(0, 1) + struct.pack(">4H", 0, 0, 0, 0))
    dinf = _box(b"dinf", _box(b"dref", _full(0) + struct.pack(">I", 1)
                               + _box(b"url ", _full(0, 1))))
    dur = sum(durations)
    mdia = _box(b"mdia", _mdhd(versions, timescale, dur)
                + _hdlr(b"vide") + _box(b"minf", vmhd + dinf + stbl))
    trak = _box(b"trak", _tkhd(versions, 1, dur, float(width), float(height)) + mdia)
    moov = _box(b"moov", _mvhd(versions, timescale, dur) + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


@dataclass
class Mp4Sample:
    offset: int
    size: int
    dts: int  # decode timestamp in media timescale units


@dataclass
class Mp4Track:
    codec: str
    width: int
    height: int
    timescale: int
    samples: list[Mp4Sample]


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, box_end) for sibling boxes — same strict
    framing rules as _walk (u32/largesize/to-end-of-scope, overrun = error)."""
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
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {fourcc!r} overruns parent")
        yield fourcc, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes) -> tuple[int, int] | None:
    for fc, body, box_end in _iter_boxes(buf, start, end):
        if fc == fourcc:
            return body, box_end
    return None


def parse_mp4_video_track(content: bytes) -> Mp4Track:
    """Reconstruct the first VIDEO track's full sample map: codec fourcc,
    declared dimensions, and every sample's absolute (offset, size, dts).

    The §8.7.4/§8.7.5 expansion: stsc runs → per-chunk sample counts;
    stco/co64 → chunk base offsets; sample k of a chunk starts at the
    chunk base plus the sizes of the samples before it; stts runs →
    cumulative decode timestamps. Raises DecoderUnavailable when the
    payload is not BMFF, ValueError on corrupt framing / no video track."""
    if len(content) < 12 or content[4:8] not in (b"ftyp", b"moov", b"free", b"skip", b"wide"):
        raise DecoderUnavailable("not an ISO BMFF payload")
    moov = _find(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for fc, t_body, t_end in _iter_boxes(content, *moov):
        if fc != b"trak":
            continue
        mdia = _find(content, t_body, t_end, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(content, *mdia, b"hdlr")
        if hdlr is None or content[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(content, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("video trak missing mdhd")
        version = content[mdhd[0]]
        timescale = struct.unpack_from(
            ">I", content, mdhd[0] + 4 + (16 if version else 8))[0]
        minf = _find(content, *mdia, b"minf")
        stbl = _find(content, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("video trak missing stbl")
        boxes = {fc: (b, e) for fc, b, e in _iter_boxes(content, *stbl)}

        def full_body(name: bytes) -> int:
            if name not in boxes:
                raise ValueError(f"stbl missing {name!r}")
            return boxes[name][0] + 4  # skip FullBox version/flags

        # stsd: first entry's fourcc + declared dims
        p = full_body(b"stsd")
        (n_entries,) = struct.unpack_from(">I", content, p)
        if n_entries < 1:
            raise ValueError("empty stsd")
        codec = content[p + 8 : p + 12].decode("ascii", "replace")
        w, h = struct.unpack_from(">HH", content, p + 12 + 8 + 16)

        # stts → per-sample deltas
        p = full_body(b"stts")
        (n_runs,) = struct.unpack_from(">I", content, p)
        deltas: list[int] = []
        for r in range(n_runs):
            cnt, d = struct.unpack_from(">II", content, p + 4 + 8 * r)
            deltas.extend([d] * cnt)

        # stsz → per-sample sizes (sample_size != 0 = uniform)
        p = full_body(b"stsz")
        uniform, n_samples = struct.unpack_from(">II", content, p)
        if uniform:
            sizes = [uniform] * n_samples
        else:
            sizes = list(struct.unpack_from(f">{n_samples}I", content, p + 8))

        # stco / co64 → chunk offsets
        if b"co64" in boxes:
            p = full_body(b"co64")
            (n_chunks,) = struct.unpack_from(">I", content, p)
            offsets = list(struct.unpack_from(f">{n_chunks}Q", content, p + 4))
        else:
            p = full_body(b"stco")
            (n_chunks,) = struct.unpack_from(">I", content, p)
            offsets = list(struct.unpack_from(f">{n_chunks}I", content, p + 4))

        # stsc runs → samples-per-chunk for every chunk
        p = full_body(b"stsc")
        (n_sc,) = struct.unpack_from(">I", content, p)
        runs = [struct.unpack_from(">III", content, p + 4 + 12 * r)
                for r in range(n_sc)]
        spc = []
        for r, (first, per, _sdi) in enumerate(runs):
            last = runs[r + 1][0] - 1 if r + 1 < len(runs) else n_chunks
            spc.extend([per] * (last - first + 1))
        if sum(spc) < n_samples:
            raise ValueError("stsc/stco cover fewer samples than stsz")

        samples: list[Mp4Sample] = []
        dts = 0
        s = 0
        for c, per in enumerate(spc):
            pos = offsets[c]
            for _ in range(per):
                if s >= n_samples:
                    break
                size = sizes[s]
                if pos + size > len(content):
                    raise ValueError("sample overruns file")
                samples.append(Mp4Sample(pos, size, dts))
                dts += deltas[s] if s < len(deltas) else 0
                pos += size
                s += 1
        if s < n_samples:
            raise ValueError("chunk map exhausted before all samples placed")
        return Mp4Track(codec, w, h, timescale, samples)
    raise ValueError("no video track")


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
