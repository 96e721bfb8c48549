"""Pure-stdlib media codecs: WAV (RIFF/PCM), PPM (P6), BMP (24-bit
BI_RGB), and Y4M (YUV4MPEG2) — real public container formats parsed from
real bytes, so the multimodal pipeline's decode kernel is an actual
decoder, not a byte-sampling stub. The heavyweight codec libraries
(Pillow, ffmpeg) are not in this environment; these four formats are the
ones fully specified by public headers + raw sample data, which is
exactly what a feature-extraction kernel needs (the reference holds its
payload formats to the same real-bytes standard — its entry formatter
encodes actual Kafka record batches, format/PulsarEntryFormatter.java:59).

No Spark imports: this module is shipped to executor Python workers BY
VALUE (pyspark.cloudpickle.register_pickle_by_value) from the operators
that use it, so it must stay self-contained (stdlib + numpy only).

Feature contract (8 doubles, all integer-valued except fps, so the DuckDB
oracle can replay them without float-summation-order hazards):
  audio  (WAV): [sample_rate, n_samples, sum, sum_sq, min, max,
                 zero_crossings, n_channels]
  image  (PPM/BMP): [width, height, sum_r, sum_g, sum_b, min, max, 3.0]
  video  (Y4M): [width, height, n_frames, sum_y, sum_u, sum_v, fps, 3.0]
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV: RIFF container, canonical fmt + data chunks, 16-bit PCM little-endian
# ---------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """Mono/interleaved s16le PCM in a canonical 44-byte-header WAV."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
        )
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> dict:
    """Walk the RIFF chunk list (NOT a fixed 44-byte offset assumption —
    real WAVs carry LIST/fact chunks between fmt and data), require
    16-bit PCM, and return header fields + sample moments."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    sign = s >= 0
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": len(s) // n_channels,
        "sum": int(s.sum()),
        "sum_sq": int((s * s).sum()),
        "min": int(s.min()) if len(s) else 0,
        "max": int(s.max()) if len(s) else 0,
        "zero_crossings": int(np.sum(sign[1:] != sign[:-1])) if len(s) else 0,
    }


# ---------------------------------------------------------------------------
# PPM: P6 binary, ASCII header (whitespace/comment tolerant), RGB top-down
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> dict:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — tokens separated by whitespace,
    # '#' comments run to end of line (the spec's full grammar)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw data
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    px = np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8)
    return _rgb_stats(px.reshape(h, w, 3), w, h)


# ---------------------------------------------------------------------------
# BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp BI_RGB, padded BGR rows,
# bottom-up by default (positive biHeight)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP from top-down RGB bytes: rows are written
    bottom-up in BGR order with 4-byte row padding, as the format demands."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    row_size = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_size - width * 3)
    body = b"".join(
        arr[r, :, ::-1].tobytes() + pad for r in range(height - 1, -1, -1)
    )
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + body


def decode_bmp(payload: bytes) -> dict:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (bpp={bpp})")
    bottom_up = height > 0
    h = abs(height)
    row_size = (width * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        start = data_offset + r * row_size
        row = np.frombuffer(payload[start : start + width * 3], dtype=np.uint8)
        rows.append(row.reshape(width, 3)[:, ::-1])  # BGR -> RGB
    if bottom_up:
        rows.reverse()
    return _rgb_stats(np.stack(rows), width, h)


def _rgb_stats(px: np.ndarray, w: int, h: int) -> dict:
    flat = px.reshape(-1, 3).astype(np.int64)
    return {
        "width": w,
        "height": h,
        "sum_r": int(flat[:, 0].sum()),
        "sum_g": int(flat[:, 1].sum()),
        "sum_b": int(flat[:, 2].sum()),
        "min": int(flat.min()),
        "max": int(flat.max()),
    }


# ---------------------------------------------------------------------------
# Y4M: YUV4MPEG2 stream header + FRAME-delimited raw planar frames (C444)
# ---------------------------------------------------------------------------


def encode_y4m(width: int, height: int, fps: int, frames) -> bytes:
    """YUV4MPEG2 stream, 4:4:4 (full-res U/V planes). ``frames`` is an
    iterable of (y_plane, u_plane, v_plane) byte strings of w*h each."""
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (width, height, fps)]
    for y, u, v in frames:
        if len(y) != width * height or len(u) != width * height or len(v) != width * height:
            raise ValueError("plane length != w*h")
        out.append(b"FRAME\n" + y + u + v)
    return b"".join(out)


def decode_y4m(payload: bytes) -> dict:
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = 0.0
    colorspace = "C420"  # the format's default when no C tag is present
    for tok in payload[9:nl].split():
        t = tok.decode("ascii")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps = int(num) / int(den)
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"only C444 supported (got {colorspace})")
    plane = w * h
    pos, n_frames = nl + 1, 0
    sums = np.zeros(3, dtype=np.int64)
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = payload.index(b"\n", pos) + 1  # frame params run to newline
        if pos + 3 * plane > len(payload):
            # np.frombuffer would silently sum a short slice — fail loudly
            raise ValueError(
                f"truncated Y4M frame at {pos}: need {3 * plane} bytes, "
                f"have {len(payload) - pos}"
            )
        for p in range(3):
            sums[p] += int(
                np.frombuffer(payload[pos : pos + plane], dtype=np.uint8).sum()
            )
            pos += plane
        n_frames += 1
    return {
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "sum_y": int(sums[0]),
        "sum_u": int(sums[1]),
        "sum_v": int(sums[2]),
        "fps": fps,
    }


# ---------------------------------------------------------------------------
# Dispatch + deterministic synthesis (the oracle-replayable fixtures)
# ---------------------------------------------------------------------------


def decode_media(payload: bytes) -> list[float]:
    """Magic-dispatch decode to the 8-double feature contract. Raises
    ValueError on unrecognized payloads — a real kernel must fail loudly,
    not silently emit stub features."""
    if payload is None:
        raise ValueError("null payload")
    if payload[:4] == b"RIFF":
        d = decode_wav(payload)
        return [
            float(d["sample_rate"]), float(d["n_samples"]), float(d["sum"]),
            float(d["sum_sq"]), float(d["min"]), float(d["max"]),
            float(d["zero_crossings"]), float(d["n_channels"]),
        ]
    if payload[:2] == b"P6":
        d = decode_ppm(payload)
    elif payload[:2] == b"BM":
        d = decode_bmp(payload)
    elif payload[:9] == b"YUV4MPEG2":
        d = decode_y4m(payload)
        return [
            float(d["width"]), float(d["height"]), float(d["n_frames"]),
            float(d["sum_y"]), float(d["sum_u"]), float(d["sum_v"]),
            float(d["fps"]), 3.0,
        ]
    else:
        raise ValueError(f"unrecognized media payload (magic={payload[:4]!r})")
    return [
        float(d["width"]), float(d["height"]), float(d["sum_r"]),
        float(d["sum_g"]), float(d["sum_b"]), float(d["min"]),
        float(d["max"]), 3.0,
    ]


# Synthesis constants — shared with the DuckDB oracles in __spark_entry__,
# which replay the same modular arithmetic in SQL; any change here must
# change there too.
IMG_W, IMG_H = 18, 12
AUDIO_RATE = 8000
VID_W, VID_H, VID_FPS = 16, 8, 25


def synth_audio(media_id: int) -> tuple[bytes, int]:
    """(wav_bytes, duration_ms): n = 20000 + (id%16)*2048 samples of
    s(i) = ((id*31 + i*17) % 4096) - 2048 at 8 kHz (both divisible by 8,
    so duration_ms = n/8 exactly)."""
    n = 20000 + (media_id % 16) * 2048
    i = np.arange(n, dtype=np.int64)
    samples = (media_id * 31 + i * 17) % 4096 - 2048
    return encode_wav(samples, AUDIO_RATE), n // 8


def synth_image(media_id: int) -> tuple[bytes, str]:
    """(image_bytes, codec): 18x12 RGB with v(idx, ch) =
    (id*7 + idx*13 + ch*101) % 256, idx row-major top-down; even ids
    encode as PPM, odd as BMP (exercising BGR + padding + bottom-up)."""
    idx = np.arange(IMG_W * IMG_H, dtype=np.int64)
    ch = np.arange(3, dtype=np.int64)
    v = (media_id * 7 + idx[:, None] * 13 + ch[None, :] * 101) % 256
    rgb = v.astype(np.uint8).tobytes()
    if media_id % 2 == 0:
        return encode_ppm(IMG_W, IMG_H, rgb), "ppm"
    return encode_bmp(IMG_W, IMG_H, rgb), "bmp"


def synth_video(media_id: int) -> tuple[bytes, int]:
    """(y4m_bytes, duration_ms): 16x8 C444, 25 fps, nf = 25 + id%25 frames
    of v(f, plane, idx) = (id*3 + f*29 + plane*101 + idx*13) % 256."""
    nf = 25 + media_id % 25
    idx = np.arange(VID_W * VID_H, dtype=np.int64)
    frames = []
    for f in range(nf):
        planes = [
            ((media_id * 3 + f * 29 + p * 101 + idx * 13) % 256)
            .astype(np.uint8)
            .tobytes()
            for p in range(3)
        ]
        frames.append(tuple(planes))
    return encode_y4m(VID_W, VID_H, VID_FPS, frames), nf * 1000 // VID_FPS


def decode_y4m_frame(payload: bytes, frame_ms: int) -> dict:
    """Decode ONE frame of a Y4M stream, located by timestamp: the frame
    index is ``frame_ms * fps / 1000``, and the seek walks only FRAME
    markers (header reads, no plane sums) until the target — so extracting
    frame k costs O(k) header hops + ONE plane read, never a full-stream
    decode. This is what makes a frame-sampling pipeline cheap: the
    exploded (media, frame_ms) rows each decode just their own frame."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps_num = fps_den = None
    colorspace = "C420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None or not fps_num:
        raise ValueError("Y4M header missing W/H/F")
    if colorspace != "C444":
        raise ValueError(f"only C444 supported (got {colorspace})")
    plane = w * h
    target = frame_ms * fps_num // (1000 * fps_den)
    pos, idx = nl + 1, 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = payload.index(b"\n", pos) + 1
        if pos + 3 * plane > len(payload):
            raise ValueError(f"truncated Y4M frame at {pos}")
        if idx == target:
            sums = [
                int(
                    np.frombuffer(
                        payload[pos + p * plane : pos + (p + 1) * plane],
                        dtype=np.uint8,
                    ).sum()
                )
                for p in range(3)
            ]
            return {
                "width": w,
                "height": h,
                "frame_idx": idx,
                "sum_y": sums[0],
                "sum_u": sums[1],
                "sum_v": sums[2],
                "fps": fps_num / fps_den,
            }
        pos += 3 * plane
        idx += 1
    raise ValueError(f"frame for t={frame_ms}ms (index {target}) past end of stream")


def decode_wav_range(payload: bytes, start_ms: int, end_ms: int) -> dict:
    """Decode ONE time slice of a PCM WAV: the RIFF walk locates the data
    chunk, the sample range is [start_ms, end_ms) x sample_rate, and only
    those bytes are read — an audio-chunk pipeline decodes each chunk's
    own slice, never the whole clip per chunk. End is clipped to the clip
    length (the final chunk of an overlap segmentation is short)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data_off, data_len = 12, None, None, 0
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[pos + 8 : pos + 24])
        elif cid == b"data":
            data_off, data_len = pos + 8, size
        pos += 8 + size + (size & 1)
    if fmt is None or data_off is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16 or n_channels != 1:
        raise ValueError("only mono 16-bit PCM ranges supported")
    total = data_len // 2
    s0 = start_ms * sample_rate // 1000
    s1 = min(end_ms * sample_rate // 1000, total)
    if s0 < 0 or s0 > total:
        raise ValueError(f"range start {start_ms}ms outside clip")
    s = np.frombuffer(
        payload[data_off + 2 * s0 : data_off + 2 * s1], dtype="<i2"
    ).astype(np.int64)
    return {
        "sample_rate": sample_rate,
        "n_samples": len(s),
        "sum": int(s.sum()) if len(s) else 0,
        "sum_sq": int((s * s).sum()) if len(s) else 0,
        "min": int(s.min()) if len(s) else 0,
        "max": int(s.max()) if len(s) else 0,
    }


def resize_rgb(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a PPM or BMP payload, re-encoded as PPM
    (the canonical uncompressed output container). Source pixel for output
    (r, c) is (r * H // out_h, c * W // out_w) — integer arithmetic, so
    the result is bit-deterministic and an oracle can replay the
    resampled grid closed-form."""
    if payload[:2] == b"P6":
        d = decode_ppm(payload)
        src = _ppm_pixels(payload)
    elif payload[:2] == b"BM":
        d = decode_bmp(payload)
        src = _bmp_pixels(payload)
    else:
        raise ValueError("resize_rgb supports PPM/BMP payloads")
    w, h = d["width"], d["height"]
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    out = src[rows[:, None], cols[None, :], :]
    return encode_ppm(out_w, out_h, out.astype(np.uint8).tobytes())


def _ppm_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 array from a P6 payload (header grammar as
    decode_ppm)."""
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1
    w, h, _ = tokens
    return np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8).reshape(
        h, w, 3
    )


def _bmp_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB array from a 24bpp BMP (padding stripped,
    bottom-up undone, BGR swapped)."""
    (data_offset,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    bottom_up = height > 0
    h = abs(height)
    row_size = (width * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        start = data_offset + r * row_size
        row = np.frombuffer(payload[start : start + width * 3], dtype=np.uint8)
        rows.append(row.reshape(width, 3)[:, ::-1])
    if bottom_up:
        rows.reverse()
    return np.stack(rows)


def patch_stats(payload: bytes, patch: int) -> list[dict]:
    """ViT-style patch grid over a PPM/BMP image: non-overlapping
    patch x patch tiles (edge tiles clipped), each reduced to per-channel
    sums + pixel count — the image-side analog of tokenization (a
    patch = one vision token; 18x12 at patch=6 -> a 3x2 token grid).
    Returns one dict per (patch_row, patch_col), row-major."""
    if payload[:2] == b"P6":
        src = _ppm_pixels(payload)
    elif payload[:2] == b"BM":
        src = _bmp_pixels(payload)
    else:
        raise ValueError("patch_stats supports PPM/BMP payloads")
    h, w = src.shape[0], src.shape[1]
    out = []
    for pr in range((h + patch - 1) // patch):
        for pc in range((w + patch - 1) // patch):
            tile = src[pr * patch : (pr + 1) * patch, pc * patch : (pc + 1) * patch]
            flat = tile.reshape(-1, 3).astype(np.int64)
            out.append(
                {
                    "patch_row": pr,
                    "patch_col": pc,
                    "n_px": int(flat.shape[0]),
                    "sum_r": int(flat[:, 0].sum()),
                    "sum_g": int(flat[:, 1].sum()),
                    "sum_b": int(flat[:, 2].sum()),
                }
            )
    return out


def audio_autocorr(payload: bytes, lags: list[int]) -> dict:
    """Integer autocorrelation of a PCM WAV at the given lags:
    ac[k] = sum_i s[i] * s[i+k] — the periodicity/silence signal an audio
    curation filter gates on (pure tones spike at their period, silence is
    ~0 everywhere). Integer-exact, so an oracle replays it closed-form."""
    d_off = None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[pos + 8 : pos + 24])
        elif cid == b"data":
            d_off, d_len = pos + 8, size
        pos += 8 + size + (size & 1)
    if fmt is None or d_off is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt[0] != 1 or fmt[5] != 16 or fmt[1] != 1:
        raise ValueError("only mono 16-bit PCM supported")
    s = np.frombuffer(payload[d_off : d_off + d_len], dtype="<i2").astype(np.int64)
    out = {"n_samples": len(s)}
    for k in lags:
        out[f"ac_{k}"] = int((s[:-k] * s[k:]).sum()) if 0 < k < len(s) else 0
    return out


def video_motion(payload: bytes) -> list[dict]:
    """Per consecutive-frame-pair motion energy of a Y4M stream:
    sum |frame_f − frame_{f−1}| per plane — the scene-cut / static-video
    signal a video curation filter gates on (a frozen clip scores ~0, a
    cut spikes). One dict per pair (f >= 1); integer-exact."""
    d = _y4m_planes(payload)
    out = []
    for f in range(1, len(d["frames"])):
        prev, cur = d["frames"][f - 1], d["frames"][f]
        out.append(
            {
                "frame_idx": f,
                "motion_y": int(np.abs(cur[0] - prev[0]).sum()),
                "motion_u": int(np.abs(cur[1] - prev[1]).sum()),
                "motion_v": int(np.abs(cur[2] - prev[2]).sum()),
            }
        )
    return out


def _y4m_planes(payload: bytes) -> dict:
    """Parse a C444 Y4M stream into per-frame int64 plane arrays."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    colorspace = "C420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"only C444 supported (got {colorspace})")
    plane = w * h
    pos, frames = nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = payload.index(b"\n", pos) + 1
        if pos + 3 * plane > len(payload):
            raise ValueError(f"truncated Y4M frame at {pos}")
        frames.append(
            tuple(
                np.frombuffer(
                    payload[pos + p * plane : pos + (p + 1) * plane], dtype=np.uint8
                ).astype(np.int64)
                for p in range(3)
            )
        )
        pos += 3 * plane
    return {"width": w, "height": h, "frames": frames}
