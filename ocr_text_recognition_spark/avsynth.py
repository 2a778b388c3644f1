"""Deterministic synthetic audio/video CONTAINER payloads for tests and
oracle fixtures.

The container has no media codecs, but the container FORMATS themselves
are codec-free public specifications: a PCM WAV file is a RIFF header
plus raw samples (no compression anywhere), and an MP4's metadata lives
in plain big-endian atom/box structures (ftyp/moov/mvhd/trak/tkhd) that
any spec-conformant muxer writes the same way. These builders construct
valid minimal files from explicit parameters — so a test (or fixture
generator) knows the EXPECTED metadata from the construction parameters
alone, independently of the parsers in operators/multimodal.py that must
recover them from the bytes.

Formats per the public specs: RIFF/WAVE (Microsoft/IBM 1991 spec: fmt
chunk fields channels/sample-rate/byte-rate/bits, then a data chunk of
raw little-endian PCM) and ISO/IEC 14496-12 (box = uint32 size + fourcc;
mvhd v0 carries uint32 timescale + duration; tkhd v0 carries width and
height as 16.16 fixed point).
"""

from __future__ import annotations

import struct

import numpy as np


def square_wave_pcm16(
    n_samples: int, amplitude: int = 8192, period: int = 8
) -> np.ndarray:
    """Deterministic ±amplitude square wave as int16 — its RMS is exactly
    ``amplitude`` (every sample is ±A), so expected loudness is known in
    closed form without running any parser."""
    t = np.arange(n_samples)
    return np.where((t // (period // 2)) % 2 == 0, amplitude, -amplitude).astype(
        np.int16
    )


def make_wav_bytes(
    samples: np.ndarray, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Minimal PCM WAV: RIFF header + fmt chunk (PCM, 16-bit) + data
    chunk. ``samples`` is int16, interleaved if multi-channel."""
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def make_mp4_bytes(
    duration_units: int,
    timescale: int = 600,
    width: int = 640,
    height: int = 360,
    n_tracks: int = 1,
    major_brand: bytes = b"isom",
) -> bytes:
    """Minimal MP4 metadata skeleton: ftyp + moov(mvhd + n×trak(tkhd)).
    No mdat/sample tables — exactly the boxes a header-only metadata
    probe reads. mvhd/tkhd are version-0 (32-bit fields); tkhd width and
    height are 16.16 fixed point."""
    ftyp = _box(b"ftyp", major_brand + struct.pack(">I", 0) + major_brand)
    # mvhd v0: version/flags, ctime, mtime, timescale, duration, rate,
    # volume, reserved(10), matrix(36), predefined(24), next_track_id
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, duration_units)
        + struct.pack(">ihH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", n_tracks + 1),
    )
    traks = b""
    for i in range(n_tracks):
        # tkhd v0: version/flags, ctime, mtime, track_id, reserved,
        # duration, reserved(8), layer, alt_group, volume, reserved,
        # matrix(36), width, height (16.16)
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3xIIIII", 0, 0, 0, i + 1, 0, duration_units)
            + b"\x00" * 8
            + struct.pack(">hhhH", 0, 0, 0x0100, 0)
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        traks += _box(b"trak", tkhd)
    return ftyp + _box(b"moov", mvhd + traks)


# --- Deterministic demo pools for the driver-contract queries ---------
#
# The pool SPEC is the single source of truth: payload bytes are BUILT
# from it (make_*_pool) and the expected metadata is DERIVED from it in
# closed form (expected_*_meta) — duration = frames/rate, square-wave
# RMS = amplitude, mp4 duration = units/timescale — never by running the
# parsers under test. The oracle SQL embeds expected_*_meta() as a
# VALUES table, so the correctness gate compares parser output against
# arithmetic on the construction parameters.

AUDIO_POOL_SPEC = [
    # (ref, sample_rate, n_frames, amplitude, channels)
    ("a00", 8000, 4000, 256, 1),
    ("a01", 16000, 8000, 512, 1),
    ("a02", 44100, 44100, 1024, 1),
    ("a03", 16000, 1600, 2048, 2),
    ("a04", 22050, 11025, 4096, 1),
    ("a05", 8000, 12000, 8192, 2),
    ("a06", 48000, 24000, 128, 1),
    ("a07", 16000, 400, 16384, 1),
]
AUDIO_POOL_CORRUPT = [("abad0", b"ID3\x04mp3-frame-data"), ("abad1", b"RIFFxxxx")]

VIDEO_POOL_SPEC = [
    # (ref, duration_units, timescale, width, height, n_tracks, brand)
    ("v00", 3000, 600, 640, 360, 1, b"isom"),
    ("v01", 600, 600, 1920, 1080, 2, b"mp42"),
    ("v02", 90000, 90000, 1280, 720, 1, b"isom"),
    ("v03", 1500, 1000, 320, 240, 3, b"avc1"),
    ("v04", 24000, 600, 3840, 2160, 2, b"isom"),
]
VIDEO_POOL_CORRUPT = [("vbad0", b"\x00\x00\x00\x08free"), ("vbad1", b"not-an-mp4")]


def make_audio_pool():
    """list of (media_ref, payload_bytes) — valid WAVs + corrupt tails."""
    rows = [
        (
            ref,
            make_wav_bytes(
                square_wave_pcm16(frames * ch, amplitude=amp),
                sample_rate=rate,
                channels=ch,
            ),
        )
        for ref, rate, frames, amp, ch in AUDIO_POOL_SPEC
    ]
    return rows + list(AUDIO_POOL_CORRUPT)


def expected_audio_meta():
    """Closed-form expected rows (ref, rate, ch, bits, duration, rms,
    n_bytes, valid): our builder's header is exactly 44 bytes, a ±A
    square wave's RMS is exactly A."""
    out = []
    for ref, rate, frames, amp, ch in AUDIO_POOL_SPEC:
        n_bytes = 44 + frames * ch * 2
        out.append((ref, rate, ch, 16, frames / rate, float(amp), n_bytes, True))
    for ref, payload in AUDIO_POOL_CORRUPT:
        out.append((ref, None, None, None, None, None, len(payload), False))
    return out


def make_video_pool():
    rows = [
        (
            ref,
            make_mp4_bytes(
                dur, timescale=ts, width=w, height=h, n_tracks=nt, major_brand=brand
            ),
        )
        for ref, dur, ts, w, h, nt, brand in VIDEO_POOL_SPEC
    ]
    return rows + list(VIDEO_POOL_CORRUPT)


def expected_video_meta():
    out = []
    for ref, dur, ts, w, h, nt, brand in VIDEO_POOL_SPEC:
        n_bytes = len(
            make_mp4_bytes(dur, timescale=ts, width=w, height=h, n_tracks=nt,
                           major_brand=brand)
        )
        out.append((ref, brand.decode(), dur / ts, w, h, nt, n_bytes, True))
    for ref, payload in VIDEO_POOL_CORRUPT:
        out.append((ref, None, None, None, None, None, len(payload), False))
    return out
