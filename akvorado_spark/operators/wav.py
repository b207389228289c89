"""Pure-stdlib WAV (RIFF) codec: header metadata + PCM16 sample decode.

The audio leg of the multimodal column stack, made REAL the same way
``operators/png.py`` did for images: no external codec library exists
in this environment, but canonical PCM WAV (RIFF spec / Microsoft
WAVE format, public) is plain struct parsing, so audio columns get
actual decode — duration, channel split, and per-channel features —
not a stub.  Compressed formats get HEADER metadata here too
(:func:`mp3_meta`, :func:`ogg_vorbis_meta` — channels/rate/bitrate are
plain struct parses of public specs); their SAMPLE decode (MDCT +
Huffman entropy pipelines) stays gated behind a clear
NotImplementedError.  The Spark-side plumbing (binary column + typed
metadata + Arrow-batched mapInPandas) is identical either way.
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
            fmt_off, fmt_size = pos, size
        elif cid == b"data" and data_len is None:
            data_len = size
            if pos + size > len(data):
                raise ValueError("truncated data chunk")
        pos += size + (size & 1)
    if fmt is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE (the container >16-bit and multi-
        # channel encoders actually write): the REAL format tag is the
        # first two bytes of the SubFormat GUID at offset 24 of the
        # fmt body (16 base + cbSize/validbits/channel-mask)
        if fmt_size < 40 or fmt_off + 26 > len(data):
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (tag,) = struct.unpack_from("<H", data, fmt_off + 24)
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


def wav_decode(data: bytes) -> tuple[int, int, list[list[int | float]]]:
    """(sample_rate, n_frames, per-channel sample lists) for PCM WAV —
    integer PCM (format tag 1, incl. resolved WAVE_FORMAT_EXTENSIBLE)
    at 8/16/24/32 bits, IEEE-float PCM (tag 3) at 32/64.  16/24/32-bit
    integers are signed little-endian; 8-bit are unsigned per the spec
    and re-centered to signed; floats come back as Python floats.
    Other encodings raise ValueError."""
    channels, rate, bits, n_frames, tag = wav_meta(data)
    if tag not in (1, 3):
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if tag == 1 and bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if tag == 3 and bits not in (32, 64):
        raise ValueError(f"unsupported float-PCM bit depth {bits}")
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
    if tag == 3:
        fmt_ch = "f" if bits == 32 else "d"
        flat = struct.unpack_from(f"<{len(raw) // (bits // 8)}{fmt_ch}", raw)
    elif bits == 16:
        flat = struct.unpack_from(f"<{len(raw) // 2}h", raw)
    elif bits == 32:
        flat = struct.unpack_from(f"<{len(raw) // 4}i", raw)
    elif bits == 24:
        flat = [
            int.from_bytes(raw[i : i + 3], "little", signed=True)
            for i in range(0, len(raw), 3)
        ]
    else:
        flat = [b - 128 for b in raw]
    out = [list(flat[c::channels]) for c in range(channels)]
    return rate, n_frames, out


# the fixed KSDATAFORMAT GUID suffix shared by every extensible subtype
_EXT_GUID_SUFFIX = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def wav_encode(
    rate: int,
    channels: list[list[int | float]],
    bits: int = 16,
    float_format: bool = False,
    extensible: bool = False,
) -> bytes:
    """WAV writer for fixtures/tests: integer PCM at 8/16/24/32 bits or
    IEEE-float at 32/64 (``float_format``), optionally wrapped in a
    WAVE_FORMAT_EXTENSIBLE fmt chunk (what real encoders emit for
    >16-bit and multichannel).  Interleaves the channel lists; lengths
    must match."""
    n_ch = len(channels)
    if n_ch == 0 or len({len(c) for c in channels}) != 1:
        raise ValueError("need >= 1 equal-length channels")
    n = len(channels[0])
    inter: list = [0] * (n * n_ch)
    for c, ch in enumerate(channels):
        inter[c::n_ch] = ch
    if float_format:
        if bits not in (32, 64):
            raise ValueError("float WAV is 32 or 64 bits")
        raw = struct.pack(f"<{len(inter)}{'f' if bits == 32 else 'd'}", *inter)
        tag = 3
    elif bits == 24:
        raw = b"".join(int(s).to_bytes(3, "little", signed=True) for s in inter)
        tag = 1
    elif bits in (8, 16, 32):
        fmt_ch = {8: "B", 16: "h", 32: "i"}[bits]
        vals = [s + 128 for s in inter] if bits == 8 else inter
        raw = struct.pack(f"<{len(inter)}{fmt_ch}", *vals)
        tag = 1
    else:
        raise ValueError(f"unsupported fixture bit depth {bits}")
    block = n_ch * (bits // 8)
    base = (0xFFFE if extensible else tag, n_ch, rate, rate * block, block, bits)
    fmt = struct.pack("<HHIIHH", *base)
    if extensible:
        fmt += struct.pack("<HHI", 22, bits, 0)  # cbSize, valid bits, mask
        fmt += struct.pack("<H", tag) + _EXT_GUID_SUFFIX
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


def wav_encode_pcm16(rate: int, channels: list[list[int]]) -> bytes:
    """Minimal PCM16 WAV writer (the original fixture entrypoint)."""
    return wav_encode(rate, channels, bits=16)


# ---------------------------------------------------------------------------
# compressed-audio HEADER metadata (public specs, stdlib only) — the
# entropy decode itself (MDCT/Huffman) stays environment-blocked, but
# channels/rate/bitrate never needed it
# ---------------------------------------------------------------------------

_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                      192, 224, 256, 320, 0]
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
                      112, 128, 144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def is_mp3(data: bytes) -> bool:
    """True on an ID3v2 tag or a leading MPEG audio frame sync."""
    if data[:3] == b"ID3":
        return True
    return len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0


def mp3_meta(data: bytes) -> tuple[int, int, int]:
    """(channels, sample_rate, bitrate_kbps) from the first MPEG audio
    frame header (layer III, MPEG-1/2/2.5).  Skips a leading ID3v2 tag
    (syncsafe length), then scans for the 11-bit frame sync; CBR is
    assumed for the bitrate (a VBR average needs the Xing header —
    out of scope).  Raises ValueError when no valid frame exists."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | (
            (data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + size
    n = len(data)
    while pos + 4 <= n:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
            version = (b1 >> 3) & 3      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (b1 >> 1) & 3        # 1 = Layer III
            if version != 1 and layer == 1:
                br_idx = (b2 >> 4) & 0xF
                sr_idx = (b2 >> 2) & 3
                if 0 < br_idx < 15 and sr_idx < 3:
                    table = (_MP3_BITRATES_V1L3 if version == 3
                             else _MP3_BITRATES_V2L3)
                    rate = _MP3_RATES[version][sr_idx]
                    mode = (b3 >> 6) & 3
                    channels = 1 if mode == 3 else 2
                    return channels, rate, table[br_idx]
        pos += 1
    raise ValueError("no MPEG layer-III frame header found")


def is_ogg(data: bytes) -> bool:
    return data[:4] == b"OggS"


def ogg_vorbis_meta(data: bytes) -> tuple[int, int]:
    """(channels, sample_rate) from the Vorbis identification header
    (Vorbis I spec §4.2.2): the first packet of the first Ogg page,
    type 1 + 'vorbis', carries u8 channels and u32le rate."""
    if not is_ogg(data):
        raise ValueError("not an Ogg stream")
    if len(data) < 27:
        raise ValueError("truncated Ogg page header")
    nseg = data[26]
    body = 27 + nseg
    pkt = data[body:]
    if len(pkt) < 16 or pkt[0] != 1 or pkt[1:7] != b"vorbis":
        raise ValueError("first Ogg packet is not a Vorbis id header")
    channels = pkt[11]
    rate = int.from_bytes(pkt[12:16], "little")
    if channels == 0 or rate == 0:
        raise ValueError("invalid Vorbis id header")
    return channels, rate


def is_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


def flac_meta(data: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits, total_samples) from the mandatory
    STREAMINFO metadata block (FLAC format spec: first block after the
    'fLaC' marker; rate 20 bits, channels-1 3 bits, bits-1 5 bits,
    total samples 36 bits packed big-endian at byte offset 10 of the
    34-byte block).  Header-only — sample decode is the Rice/LPC
    pipeline, out of proportion for a data engine (see COVERAGE.md)."""
    if not is_flac(data):
        raise ValueError("not a FLAC stream")
    if len(data) < 8 + 34:
        raise ValueError("truncated FLAC header")
    if data[4] & 0x7F != 0:  # block type 0 = STREAMINFO, must be first
        raise ValueError("FLAC stream does not start with STREAMINFO")
    block = data[8:42]
    packed = int.from_bytes(block[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("invalid FLAC STREAMINFO (zero sample rate)")
    return channels, rate, bits, total
