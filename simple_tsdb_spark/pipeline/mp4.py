"""Pure-Python ISO-BMFF (MP4/MOV) structural parser — public-spec
ISO/IEC 14496-12 box grammar, stdlib ``struct`` only.

This is a STRUCTURAL decode, not a codec: it walks the box tree
(``ftyp``/``moov``/``trak``/``mdia``/``minf``/``stbl``), reads the
movie/track/media headers, and reconstructs the full per-sample
(frame) table from ``stsz`` + ``stsc`` + ``stco``/``co64`` — exactly
the information a frame-sampling pipeline needs to pull REAL frame
byte ranges out of ``mdat`` without decoding video.  Fragmented MP4
(§8.8) is supported too: ``mvex``/``trex`` defaults, ``moof``/``traf``
/``trun`` sample runs with moof-relative or explicit base offsets, and
``styp``-led media segments without a ``moov`` at all (tracks are then
synthesized from the fragments).  Decoding the frame pixels themselves
(H.264/H.265/AV1) requires codec libraries not bundled in this
container and stays behind ``DecoderNotAvailable``.

The sample-table reconstruction is the standard 14496-12 §8.7
algorithm: ``stsc`` chunk runs expand to a per-chunk sample count,
each chunk's base offset comes from ``stco``, and intra-chunk sample
offsets accumulate ``stsz`` sizes.
"""

from __future__ import annotations

import struct

from simple_tsdb_spark.pipeline.jpeg import DecoderNotAvailable

#: container boxes whose payload is a sequence of child boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf"}


def _walk(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in range."""
    off = start
    while off + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, off)
        hdr = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise DecoderNotAvailable("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", buf, off + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        if size < hdr or off + size > end:
            raise DecoderNotAvailable(
                f"box {btype!r} size {size} overruns enclosing scope"
            )
        yield btype, off + hdr, off + size
        off += size


def _find(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _walk(buf, start, end):
        if t == btype:
            return s, e
    return None


def _fullbox(buf: bytes, start: int) -> tuple[int, int]:
    """(version, payload_offset_after_version_flags)."""
    version = buf[start]
    return version, start + 4


def _parse_mvhd(buf: bytes, s: int, e: int) -> dict:
    v, p = _fullbox(buf, s)
    if v == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", buf, p)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", buf, p)
    return {"timescale": timescale, "duration": duration}


def _parse_tkhd(buf: bytes, s: int, e: int) -> dict:
    v, p = _fullbox(buf, s)
    if v == 1:
        _, _, track_id = struct.unpack_from(">QQI", buf, p)
    else:
        _, _, track_id = struct.unpack_from(">III", buf, p)
    # width/height are the LAST two 16.16 fixed-point fields of the box;
    # a truncated tkhd must not read bytes outside its own extent (or,
    # via a negative offset, from the wrong place entirely)
    if e - 8 < p:
        raise DecoderNotAvailable("truncated tkhd box")
    w_fx, h_fx = struct.unpack_from(">II", buf, e - 8)
    return {"track_id": track_id, "width": w_fx >> 16, "height": h_fx >> 16}


def _parse_mdhd(buf: bytes, s: int, e: int) -> dict:
    v, p = _fullbox(buf, s)
    if v == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", buf, p)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", buf, p)
    return {"timescale": timescale, "duration": duration}


def _parse_hdlr(buf: bytes, s: int, e: int) -> str:
    _, p = _fullbox(buf, s)
    return buf[p + 4 : p + 8].decode("latin-1")


def _parse_stsd_codec(buf: bytes, s: int, e: int) -> str | None:
    _, p = _fullbox(buf, s)
    (count,) = struct.unpack_from(">I", buf, p)
    if count < 1 or p + 16 > e:
        return None
    return buf[p + 8 : p + 12].decode("latin-1")


def _parse_stsz(buf: bytes, s: int, e: int) -> tuple[int, list[int]]:
    _, p = _fullbox(buf, s)
    fixed, count = struct.unpack_from(">II", buf, p)
    if fixed:
        # fixed-size mode has no byte table to bound-check the count
        # against; a malformed 32-bit count must not allocate GBs.
        if count * fixed > len(buf):
            raise DecoderNotAvailable(
                f"stsz declares {count} samples x {fixed} B > file size"
            )
        return count, [fixed] * count
    if p + 8 + 4 * count > e:
        raise DecoderNotAvailable("truncated stsz size table")
    return count, list(struct.unpack_from(f">{count}I", buf, p + 8))


def _parse_stco(buf: bytes, s: int, e: int, wide: bool) -> list[int]:
    _, p = _fullbox(buf, s)
    (count,) = struct.unpack_from(">I", buf, p)
    fmt, width = (">Q", 8) if wide else (">I", 4)
    if p + 4 + width * count > e:
        raise DecoderNotAvailable("truncated chunk-offset table")
    return [
        struct.unpack_from(fmt, buf, p + 4 + width * i)[0] for i in range(count)
    ]


def _parse_stsc(buf: bytes, s: int, e: int) -> list[tuple[int, int]]:
    """[(first_chunk, samples_per_chunk)] runs."""
    _, p = _fullbox(buf, s)
    (count,) = struct.unpack_from(">I", buf, p)
    if p + 4 + 12 * count > e:
        raise DecoderNotAvailable("truncated stsc run table")
    return [
        struct.unpack_from(">II", buf, p + 4 + 12 * i) for i in range(count)
    ]


def _sample_table(
    sizes: list[int], stsc: list[tuple[int, int]], chunk_offsets: list[int]
) -> list[tuple[int, int]]:
    """Per-sample (offset, size) — 14496-12 §8.7 chunk-run expansion."""
    out: list[tuple[int, int]] = []
    n_chunks = len(chunk_offsets)
    si = 0
    for run_idx, (first_chunk, per_chunk) in enumerate(stsc):
        last_chunk = (
            stsc[run_idx + 1][0] - 1 if run_idx + 1 < len(stsc) else n_chunks
        )
        for chunk in range(first_chunk, last_chunk + 1):
            if chunk > n_chunks:
                break
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out


# -- fragmented MP4 (14496-12 §8.8: mvex/moof/traf/trun) ---------------------

_TFHD_BASE_DATA_OFFSET = 0x1
_TFHD_SAMPLE_DESC_IDX = 0x2
_TFHD_DEFAULT_DURATION = 0x8
_TFHD_DEFAULT_SIZE = 0x10
_TFHD_DEFAULT_FLAGS = 0x20
_TRUN_DATA_OFFSET = 0x1
_TRUN_FIRST_FLAGS = 0x4
_TRUN_SAMPLE_DURATION = 0x100
_TRUN_SAMPLE_SIZE = 0x200
_TRUN_SAMPLE_FLAGS = 0x400
_TRUN_SAMPLE_CTO = 0x800


def _flags(buf: bytes, s: int) -> int:
    return int.from_bytes(buf[s + 1 : s + 4], "big")


def _parse_trex(buf: bytes, s: int, e: int) -> tuple[int, dict]:
    _, p = _fullbox(buf, s)
    track_id, _dsdi, ddur, dsize, _dflags = struct.unpack_from(">5I", buf, p)
    return track_id, {"dur": ddur, "size": dsize}


def _parse_tfhd(buf: bytes, s: int, e: int) -> dict:
    flags = _flags(buf, s)
    p = s + 4
    (track_id,) = struct.unpack_from(">I", buf, p)
    p += 4
    out: dict = {"track_id": track_id}
    if flags & _TFHD_BASE_DATA_OFFSET:
        (out["base_data_offset"],) = struct.unpack_from(">Q", buf, p)
        p += 8
    if flags & _TFHD_SAMPLE_DESC_IDX:
        p += 4
    if flags & _TFHD_DEFAULT_DURATION:
        (out["default_dur"],) = struct.unpack_from(">I", buf, p)
        p += 4
    if flags & _TFHD_DEFAULT_SIZE:
        (out["default_size"],) = struct.unpack_from(">I", buf, p)
        p += 4
    return out


def _parse_trun(buf: bytes, s: int, e: int, default_dur, default_size):
    """(data_offset or None, [(duration, size)])."""
    version = buf[s]
    flags = _flags(buf, s)
    p = s + 4
    (count,) = struct.unpack_from(">I", buf, p)
    p += 4
    data_offset = None
    if flags & _TRUN_DATA_OFFSET:
        (data_offset,) = struct.unpack_from(">i", buf, p)
        p += 4
    if flags & _TRUN_FIRST_FLAGS:
        p += 4
    per_row = sum(
        4
        for f in (_TRUN_SAMPLE_DURATION, _TRUN_SAMPLE_SIZE, _TRUN_SAMPLE_FLAGS, _TRUN_SAMPLE_CTO)
        if flags & f
    )
    if p + per_row * count > e:
        raise DecoderNotAvailable("truncated trun sample table")
    rows = []
    for _ in range(count):
        dur, size = default_dur, default_size
        if flags & _TRUN_SAMPLE_DURATION:
            (dur,) = struct.unpack_from(">I", buf, p)
            p += 4
        if flags & _TRUN_SAMPLE_SIZE:
            (size,) = struct.unpack_from(">I", buf, p)
            p += 4
        if flags & _TRUN_SAMPLE_FLAGS:
            p += 4
        if flags & _TRUN_SAMPLE_CTO:
            p += 4  # signed in v1; structural probe ignores CTO either way
        if size is None:
            raise DecoderNotAvailable("trun sample without size (no tfhd/trex default)")
        rows.append((dur or 0, size))
    del version
    return data_offset, rows


def _new_track(track_id) -> dict:
    return {
        "track_id": track_id, "handler": None, "codec": None,
        "timescale": None, "duration": None, "width": 0, "height": 0,
        "n_samples": 0, "total_sample_bytes": 0, "samples": [],
    }


def _default_run_base(buf, moof_end):
    """Fallback base for a first trun that carries no data_offset under a
    tfhd with no base_data_offset.  §8.8.7's literal default (first byte
    of the enclosing moof) would make the synthesized offsets point at
    the moof header bytes themselves, so use the payload of the mdat box
    that follows the moof — where every real muxer puts the run."""
    for btype, ps, _pe in _walk(buf, moof_end, len(buf)):
        if btype == b"mdat":
            return ps
        if btype == b"moof":
            break
    return moof_end


def _apply_moof(buf, moof_start, ps, pe, tracks_by_id, trex, frag_dur):
    """Append one movie fragment's samples to its tracks.  Sample base
    offsets follow §8.8.7: an explicit tfhd base_data_offset, else the
    first byte of the enclosing moof (default-base-is-moof and the
    universal smooth-streaming convention); successive truns continue
    where the previous one ended when they carry no data_offset.  A
    first trun with no data_offset under an offset-less tfhd starts at
    the following mdat's payload (see :func:`_default_run_base`)."""
    for t, s, e in _walk(buf, ps, pe):
        if t != b"traf":
            continue
        tfhd_loc = _find(buf, s, e, b"tfhd")
        if tfhd_loc is None:
            raise DecoderNotAvailable("traf without tfhd")
        tfhd = _parse_tfhd(buf, *tfhd_loc)
        tid = tfhd["track_id"]
        defaults = trex.get(tid, {})
        ddur = tfhd.get("default_dur", defaults.get("dur"))
        dsize = tfhd.get("default_size", defaults.get("size"))
        explicit_base = "base_data_offset" in tfhd
        base = tfhd.get("base_data_offset", moof_start)
        trk = tracks_by_id.get(tid)
        if trk is None:
            trk = tracks_by_id[tid] = _new_track(tid)
        run_end = base if explicit_base else None
        for tt, ts_, te_ in _walk(buf, s, e):
            if tt != b"trun":
                continue
            data_offset, rows = _parse_trun(buf, ts_, te_, ddur, dsize)
            if data_offset is not None:
                off = base + data_offset
            elif run_end is not None:
                off = run_end
            else:
                off = _default_run_base(buf, pe)
            for dur, size in rows:
                trk["samples"].append((off, size))
                off += size
                frag_dur[tid] = frag_dur.get(tid, 0) + dur
            run_end = off


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO-BMFF stream into a structural probe:

    ``{"brand", "timescale", "duration", "duration_ms", "tracks": [
    {"track_id", "handler", "codec", "timescale", "duration",
    "width", "height", "n_samples", "total_sample_bytes",
    "samples": [(offset, size), ...]}]}``.

    Raises :class:`DecoderNotAvailable` for non-BMFF or truncated
    input (same contract as the other pure-Python decoders).
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[4:8] not in (b"ftyp", b"moov", b"styp"):
        raise DecoderNotAvailable("not an ISO-BMFF stream (no ftyp/moov)")
    try:
        return _parse_mp4_checked(buf)
    except (struct.error, IndexError) as exc:
        # valid magic but a box payload shorter than its declared
        # fields (truncated/corrupt upload): same DecoderNotAvailable
        # contract as the BMP/WAV decoders, so mapInPandas callers
        # fall back to the metadata row instead of crashing the job.
        raise DecoderNotAvailable(f"truncated/corrupt BMFF box: {exc}") from exc


def _walk_with_start(buf: bytes, start: int, end: int):
    """Like :func:`_walk` but also yields the box's own start offset
    (needed for moof-relative fragment data offsets)."""
    off = start
    for btype, ps, pe in _walk(buf, start, end):
        yield btype, off, ps, pe
        off = pe


def _parse_mp4_checked(buf: bytes) -> dict:
    brand = buf[8:12].decode("latin-1") if buf[4:8] in (b"ftyp", b"styp") else ""
    moov = _find(buf, 0, len(buf), b"moov")
    has_moof = any(t == b"moof" for t, _s, _e in _walk(buf, 0, len(buf)))
    if moov is None and not has_moof:
        raise DecoderNotAvailable("no moov/moof box")
    if moov is None:
        # media segment (styp + moof + mdat): tracks synthesized from
        # the fragments alone; no movie header to report
        mvhd = {"timescale": 0, "duration": 0}
        ms = me = 0
    else:
        ms, me = moov
        mvhd_loc = _find(buf, ms, me, b"mvhd")
        if mvhd_loc is None:
            raise DecoderNotAvailable("moov without mvhd")
        mvhd = _parse_mvhd(buf, *mvhd_loc)
    trex: dict[int, dict] = {}
    mehd_duration = 0
    if moov is not None:
        mvex = _find(buf, ms, me, b"mvex")
        if mvex:
            for t, s, e in _walk(buf, *mvex):
                if t == b"trex":
                    tid, defaults = _parse_trex(buf, s, e)
                    trex[tid] = defaults
                elif t == b"mehd":
                    v, p = _fullbox(buf, s)
                    (mehd_duration,) = struct.unpack_from(
                        ">Q" if v == 1 else ">I", buf, p
                    )
    tracks = []
    for t, s, e in _walk(buf, ms, me):
        if t != b"trak":
            continue
        trk: dict = {
            "track_id": None, "handler": None, "codec": None,
            "timescale": None, "duration": None, "width": 0, "height": 0,
            "n_samples": 0, "total_sample_bytes": 0, "samples": [],
        }
        tkhd_loc = _find(buf, s, e, b"tkhd")
        if tkhd_loc:
            trk.update(_parse_tkhd(buf, *tkhd_loc))
        mdia = _find(buf, s, e, b"mdia")
        if mdia:
            mdhd_loc = _find(buf, *mdia, b"mdhd")
            if mdhd_loc:
                trk.update(_parse_mdhd(buf, *mdhd_loc))
            hdlr_loc = _find(buf, *mdia, b"hdlr")
            if hdlr_loc:
                trk["handler"] = _parse_hdlr(buf, *hdlr_loc)
            minf = _find(buf, *mdia, b"minf")
            stbl = _find(buf, *minf, b"stbl") if minf else None
            if stbl:
                stsd_loc = _find(buf, *stbl, b"stsd")
                if stsd_loc:
                    trk["codec"] = _parse_stsd_codec(buf, *stsd_loc)
                stsz_loc = _find(buf, *stbl, b"stsz")
                stsc_loc = _find(buf, *stbl, b"stsc")
                stco_loc = _find(buf, *stbl, b"stco")
                co64_loc = _find(buf, *stbl, b"co64")
                if stsz_loc and stsc_loc and (stco_loc or co64_loc):
                    n, sizes = _parse_stsz(buf, *stsz_loc)
                    runs = _parse_stsc(buf, *stsc_loc)
                    offs = (
                        _parse_stco(buf, *stco_loc, wide=False)
                        if stco_loc
                        else _parse_stco(buf, *co64_loc, wide=True)
                    )
                    samples = _sample_table(sizes, runs, offs)
                    trk["n_samples"] = n
                    trk["total_sample_bytes"] = sum(sz for _, sz in samples)
                    trk["samples"] = samples
        tracks.append(trk)

    # movie fragments: append trun samples to their tracks
    tracks_by_id = {trk["track_id"]: trk for trk in tracks if trk["track_id"]}
    frag_dur: dict[int, int] = {}
    for t, box_start, ps, pe in _walk_with_start(buf, 0, len(buf)):
        if t == b"moof":
            _apply_moof(buf, box_start, ps, pe, tracks_by_id, trex, frag_dur)
    for tid, trk in tracks_by_id.items():
        if all(trk is not x for x in tracks):
            tracks.append(trk)  # fragment-only track (no moov trak)
        if trk["samples"] and trk["n_samples"] != len(trk["samples"]):
            trk["n_samples"] = len(trk["samples"])
            trk["total_sample_bytes"] = sum(sz for _, sz in trk["samples"])
        if not trk["duration"] and frag_dur.get(tid):
            trk["duration"] = frag_dur[tid]  # media-timescale units

    duration = mvhd["duration"] or mehd_duration
    ts = mvhd["timescale"] or 1
    return {
        "brand": brand,
        "timescale": mvhd["timescale"],
        "duration": duration,
        "duration_ms": (duration * 1000) // ts,
        "tracks": tracks,
    }


def probe_mp4(payload: bytes) -> dict:
    """:func:`parse_mp4` without the (possibly large) per-sample
    tables — the cheap metadata surface for a catalog/stats pass."""
    full = parse_mp4(payload)
    for trk in full["tracks"]:
        trk.pop("samples")
    return full
