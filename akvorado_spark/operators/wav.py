"""Pure-stdlib WAV (RIFF) codec: header metadata + PCM16 sample decode.

The audio leg of the multimodal column stack, made REAL the same way
``operators/png.py`` did for images: no external codec library exists
in this environment, but canonical PCM WAV (RIFF spec / Microsoft
WAVE format, public) is plain struct parsing, so audio columns get
actual decode — duration, channel split, and per-channel features —
not a stub.  Compressed formats (MP3/OGG/...) remain gated behind a
clear NotImplementedError; their Spark-side plumbing (binary column +
typed metadata + Arrow-batched mapInPandas) is identical.
"""

from __future__ import annotations

import struct


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def wav_meta(data: bytes) -> tuple[int, int, int, int, int]:
    """(channels, sample_rate, bits_per_sample, n_frames, fmt_tag) from
    the fmt/data chunks.  Walks the RIFF chunk list (chunks are
    word-aligned; unknown chunks are skipped), so files with LIST/cue
    chunks parse fine.  Only the FIRST data chunk counts — the same
    chunk wav_decode reads — so n_frames always agrees with the decoded
    sample count.  Raises ValueError on anything malformed."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            if size < 16 or pos + 16 > len(data):
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, pos)
        elif cid == b"data" and data_len is None:
            data_len = size
            if pos + size > len(data):
                raise ValueError("truncated data chunk")
        pos += size + (size & 1)
    if fmt is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if channels == 0 or block_align == 0:
        raise ValueError("zero channels or block align")
    if tag == 1 and block_align != channels * ((bits + 7) // 8):
        # a padded/malformed PCM block_align would make this n_frames
        # disagree with wav_decode's per-channel sample counts — the
        # meta/decode agreement invariant the docstring promises
        raise ValueError(
            f"PCM block_align {block_align} != channels*bytes-per-sample "
            f"{channels * ((bits + 7) // 8)}"
        )
    return channels, rate, bits, data_len // block_align, tag


def wav_decode(data: bytes) -> tuple[int, int, list[list[int]]]:
    """(sample_rate, n_frames, per-channel int sample lists) for PCM
    WAV (format tag 1) at 8 or 16 bits.  16-bit samples are signed
    little-endian; 8-bit are unsigned per the spec and re-centered to
    signed.  Other encodings raise ValueError."""
    channels, rate, bits, n_frames, tag = wav_meta(data)
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits not in (8, 16):
        raise ValueError(f"unsupported PCM bit depth {bits}")
    pos = 12
    raw = b""
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"data":
            raw = data[pos : pos + size]
            break
        pos += size + (size & 1)
    # a data length that is not a frame multiple would de-interleave
    # raggedly; keep whole frames only, matching wav_meta's n_frames
    block = channels * (bits // 8)
    raw = raw[: n_frames * block]
    if bits == 16:
        flat = struct.unpack_from(f"<{len(raw) // 2}h", raw)
    else:
        flat = [b - 128 for b in raw]
    out = [list(flat[c::channels]) for c in range(channels)]
    return rate, n_frames, out


def wav_encode_pcm16(
    rate: int, channels: list[list[int]]
) -> bytes:
    """Minimal PCM16 WAV writer for fixtures/tests (interleaves the
    channel lists; lengths must match)."""
    n_ch = len(channels)
    if n_ch == 0 or len({len(c) for c in channels}) != 1:
        raise ValueError("need >= 1 equal-length channels")
    n = len(channels[0])
    inter = [0] * (n * n_ch)
    for c, ch in enumerate(channels):
        inter[c::n_ch] = ch
    raw = struct.pack(f"<{len(inter)}h", *inter)
    block = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )
