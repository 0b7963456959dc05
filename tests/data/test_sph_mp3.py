"""NIST SPHERE decode (TEDLIUM's format) and the gated mp3 path.

Parity: the reference decodes sph/mp3 via soundfile/pydub
(/root/reference/neurst/data/datasets/audio/audio_dataset.py:147-193);
sph is reimplemented natively here, mp3 probes host backends.
"""

import numpy as np
import pytest


def _make_sph(payload: bytes, **fields) -> bytes:
    lines = ["NIST_1A", "   1024"]
    for k, v in fields.items():
        if isinstance(v, int):
            lines.append(f"{k} -i {v}")
        elif isinstance(v, float):
            lines.append(f"{k} -r {v}")
        else:
            lines.append(f"{k} -s{len(str(v))} {v}")
    lines.append("end_head")
    header = "\n".join(lines).encode("ascii")
    assert len(header) < 1024
    return header + b"\0" * (1024 - len(header)) + payload


def test_sph_pcm16_little_endian():
    from neurst_tpu.data.audio.sph_io import decode_sph
    pcm = np.array([0, 1000, -1000, 32767, -32768], np.int16)
    data = _make_sph(pcm.astype("<i2").tobytes(),
                     sample_rate=16000, channel_count=1,
                     sample_n_bytes=2, sample_byte_format="01",
                     sample_count=len(pcm), sample_coding="pcm")
    wav, rate = decode_sph(data)
    assert rate == 16000
    np.testing.assert_array_equal(wav, pcm.astype(np.float32))


def test_sph_pcm16_big_endian():
    from neurst_tpu.data.audio.sph_io import decode_sph
    pcm = np.array([12, -34, 5678, -9012], np.int16)
    data = _make_sph(pcm.astype(">i2").tobytes(),
                     sample_rate=8000, channel_count=1,
                     sample_n_bytes=2, sample_byte_format="10",
                     sample_count=len(pcm))
    wav, rate = decode_sph(data)
    assert rate == 8000
    np.testing.assert_array_equal(wav, pcm.astype(np.float32))


def test_sph_stereo_downmix():
    from neurst_tpu.data.audio.sph_io import decode_sph
    pcm = np.array([100, 300, -100, -300], np.int16)  # L,R,L,R
    data = _make_sph(pcm.astype("<i2").tobytes(),
                     sample_rate=16000, channel_count=2,
                     sample_n_bytes=2, sample_byte_format="01",
                     sample_count=2)
    wav, _ = decode_sph(data)
    np.testing.assert_array_equal(wav, [200.0, -200.0])


def test_g711_known_values():
    from neurst_tpu.data.audio.sph_io import alaw_to_linear, ulaw_to_linear
    # canonical mu-law: 0x00 -> -32124 (max magnitude), idle 0xFF -> 0
    assert int(ulaw_to_linear(np.array([0x00]))[0]) == -32124
    assert int(ulaw_to_linear(np.array([0xFF]))[0]) == 0
    assert int(ulaw_to_linear(np.array([0x80]))[0]) == 32124
    # canonical A-law: idle code 0xD5 -> +8, 0x55 -> -8, 0x2A -> max neg
    assert int(alaw_to_linear(np.array([0xD5]))[0]) == 8
    assert int(alaw_to_linear(np.array([0x55]))[0]) == -8
    assert int(alaw_to_linear(np.array([0xAA]))[0]) == 32256
    assert int(alaw_to_linear(np.array([0x2A]))[0]) == -32256


def test_sph_ulaw_roundtrip_monotonic():
    from neurst_tpu.data.audio.sph_io import decode_sph, ulaw_to_linear
    codes = np.arange(256, dtype=np.uint8)
    data = _make_sph(codes.tobytes(), sample_rate=8000, channel_count=1,
                     sample_n_bytes=1, sample_coding="ulaw",
                     sample_count=256)
    wav, rate = decode_sph(data)
    assert rate == 8000
    np.testing.assert_array_equal(
        wav, ulaw_to_linear(codes).astype(np.float32))
    # expansion must be odd-symmetric: code k and its sign-flipped
    # counterpart (k ^ 0x80) decode to opposite values
    lin = ulaw_to_linear(codes)
    np.testing.assert_array_equal(lin[:128], -lin[128:])


def test_sph_shorten_raises():
    from neurst_tpu.data.audio.sph_io import decode_sph
    data = _make_sph(b"\0" * 16, sample_rate=16000, channel_count=1,
                     sample_n_bytes=2,
                     sample_coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(NotImplementedError, match="shorten"):
        decode_sph(data)


def test_decode_audio_dispatches_sph():
    from neurst_tpu.data.audio.wav_io import decode_audio
    pcm = np.array([1, 2, 3], np.int16)
    data = _make_sph(pcm.astype("<i2").tobytes(),
                     sample_rate=16000, channel_count=1,
                     sample_n_bytes=2, sample_byte_format="01",
                     sample_count=3)
    wav, rate = decode_audio(data, "sph")
    np.testing.assert_array_equal(wav, [1.0, 2.0, 3.0])


def test_mp3_gated_with_clear_error_or_decodes():
    """On hosts without any mp3 backend the decoder must raise a
    NotImplementedError naming the remedies; with a backend it must
    return a waveform."""
    from neurst_tpu.data.audio.mp3_io import available_backend
    from neurst_tpu.data.audio.wav_io import decode_audio
    if available_backend() is None:
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            decode_audio(b"\xff\xfb\x90\x00" + b"\0" * 100, "mp3")
    else:  # pragma: no cover - backend-dependent
        pytest.skip(f"mp3 backend {available_backend()} present")


def test_mp3_decodes_via_pygame_backend():
    """When SDL_mixer (pygame) is the available backend, a real mp3
    decodes to a plausible waveform at the header's native rate (no
    mixer resampling).  Uses the mp3 pygame itself ships."""
    import os
    from neurst_tpu.data.audio.mp3_io import (_frame_header_info,
                                              available_backend)
    from neurst_tpu.data.audio.wav_io import decode_audio
    if available_backend() != "pygame":
        pytest.skip(f"backend is {available_backend()}, not pygame")
    import pygame
    sample = os.path.join(os.path.dirname(pygame.__file__),
                          "examples", "data", "house_lo.mp3")
    if not os.path.exists(sample):
        pytest.skip("pygame example mp3 not shipped")
    data = open(sample, "rb").read()
    rate_hdr, _ = _frame_header_info(data)
    wav, rate = decode_audio(data, "mp3")
    assert rate == rate_hdr
    assert wav.dtype == np.float32 and wav.ndim == 1
    # several seconds of real audio with int16-scale energy
    assert len(wav) > rate  # > 1 second
    rms = float(np.sqrt(np.mean(wav ** 2)))
    assert 100.0 < rms < 32768.0


def test_mp3_frame_header_channels_parse():
    from neurst_tpu.data.audio.mp3_io import _frame_header_info
    # mode bits (byte 3 >> 6): 3 == single channel, else stereo-ish
    mono = bytes([0xFF, 0xFB, 0x90, 0xC0])
    assert _frame_header_info(mono + b"\0" * 10) == (44100, 1)
    joint = bytes([0xFF, 0xFB, 0x90, 0x40])
    assert _frame_header_info(joint + b"\0" * 10) == (44100, 2)


def test_mp3_frame_header_rate_parse():
    from neurst_tpu.data.audio.mp3_io import _frame_header_rate
    # MPEG-1 Layer III, 44100 Hz frame sync header
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    assert _frame_header_rate(hdr + b"\0" * 10) == 44100
    # MPEG-2 (version bits 10) with rate index 0 -> 22050
    hdr2 = bytes([0xFF, 0xF3, 0x90, 0x00])
    assert _frame_header_rate(hdr2 + b"\0" * 10) == 22050
    # ID3v2 tag is skipped before the frame scan
    id3 = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\0" * 10
    assert _frame_header_rate(id3 + hdr + b"\0" * 10) == 44100
