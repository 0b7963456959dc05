"""Native FLAC decoder tests.

A minimal in-test FLAC *encoder* (bit-exact to the spec for verbatim,
constant and fixed-order-2 subframes with rice residuals, mono and
left/side stereo) produces streams the C++ decoder must invert exactly.
"""

import numpy as np
import pytest


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value, bits):
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value, bits):
        self.write(value & ((1 << bits) - 1), bits)

    def align(self):
        while self.nbits:
            self.write(0, 1)


def _streaminfo(rate, channels, bps, total):
    b = BitWriter()
    b.write(1, 1)       # last metadata block
    b.write(0, 7)       # STREAMINFO
    b.write(34, 24)     # length
    b.write(16, 16)     # min block size
    b.write(16384, 16)  # max block size
    b.write(0, 24)      # min frame size
    b.write(0, 24)      # max frame size
    b.write(rate, 20)
    b.write(channels - 1, 3)
    b.write(bps - 1, 5)
    b.write(total, 36)
    b.write(0, 128)     # md5
    return bytes(b.bytes)


def _frame_header(b, block_size, ch_code, bps_code):
    b.write(0x3FFE, 14)  # sync
    b.write(0, 1)        # reserved
    b.write(0, 1)        # fixed blocksize strategy
    b.write(7, 4)        # blocksize: 16-bit value follows
    b.write(0, 4)        # sample rate: from STREAMINFO
    b.write(ch_code, 4)
    b.write(bps_code, 3)
    b.write(0, 1)
    b.write(0, 8)        # frame number 0 (utf8)
    b.write(block_size - 1, 16)
    b.write(0, 8)        # crc8 (decoder does not verify)


def _verbatim_subframe(b, samples, bps):
    b.write(0, 1)        # padding
    b.write(1, 6)        # VERBATIM
    b.write(0, 1)        # no wasted bits
    for s in samples:
        b.write_signed(int(s), bps)


def _fixed2_subframe(b, samples, bps):
    """FIXED order 2 with one rice partition."""
    b.write(0, 1)
    b.write(0x08 | 2, 6)  # FIXED, order 2
    b.write(0, 1)
    b.write_signed(int(samples[0]), bps)
    b.write_signed(int(samples[1]), bps)
    resid = [int(samples[i]) - (2 * int(samples[i - 1])
                                - int(samples[i - 2]))
             for i in range(2, len(samples))]
    b.write(0, 2)        # 4-bit rice method
    b.write(0, 4)        # partition order 0
    rice = 4
    b.write(rice, 4)
    for r in resid:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        u = (2 * r) if r >= 0 else (-2 * r - 1)
        q, rem = u >> rice, u & ((1 << rice) - 1)
        b.write(0, q) if q == 0 else None
        for _ in range(q):
            b.write(0, 1)
        b.write(1, 1)
        b.write(rem, rice)


def _encode(frames_spec, rate=16000, channels=1, bps=16):
    total = sum(len(s[0]) if channels == 1 else len(s[0][0])
                for s in frames_spec)
    out = bytearray(b"fLaC")
    out += _streaminfo(rate, channels, bps, total)
    for spec in frames_spec:
        b = BitWriter()
        if channels == 1:
            samples, kind = spec
            _frame_header(b, len(samples), 0, 4)  # 1ch, 16bps
            if kind == "verbatim":
                _verbatim_subframe(b, samples, bps)
            else:
                _fixed2_subframe(b, samples, bps)
        else:
            (left, side), kind = spec
            _frame_header(b, len(left), 8, 4)     # left/side stereo
            _verbatim_subframe(b, left, bps)
            _verbatim_subframe(b, side, bps + 1)
        b.align()
        b.write(0, 16)   # crc16 (unverified)
        out += bytes(b.bytes)
    return bytes(out)


@pytest.fixture(scope="module")
def flac():
    from neurst_tpu.data.audio import flac_io
    if not flac_io.flac_available():
        pytest.skip("native flac decoder could not be built")
    return flac_io


def test_verbatim_roundtrip(flac):
    rng = np.random.RandomState(0)
    samples = rng.randint(-3000, 3000, size=64).astype(np.int64)
    data = _encode([(samples, "verbatim")])
    wave, rate = flac.decode_flac(data)
    assert rate == 16000
    np.testing.assert_array_equal(wave.astype(np.int64), samples)


def test_fixed_order2_rice_roundtrip(flac):
    # smooth signal so order-2 residuals are small
    t = np.arange(64)
    samples = (100 * np.sin(t / 5.0)).astype(np.int64)
    data = _encode([(samples, "fixed2")])
    wave, rate = flac.decode_flac(data)
    np.testing.assert_array_equal(wave.astype(np.int64), samples)


def test_multi_frame(flac):
    rng = np.random.RandomState(1)
    f1 = rng.randint(-500, 500, size=32).astype(np.int64)
    f2 = rng.randint(-500, 500, size=48).astype(np.int64)
    data = _encode([(f1, "verbatim"), (f2, "verbatim")])
    wave, _ = flac.decode_flac(data)
    np.testing.assert_array_equal(wave.astype(np.int64),
                                  np.concatenate([f1, f2]))


def test_left_side_stereo(flac):
    rng = np.random.RandomState(2)
    left = rng.randint(-2000, 2000, size=32).astype(np.int64)
    right = rng.randint(-2000, 2000, size=32).astype(np.int64)
    side = left - right
    data = _encode([((left, side), "verbatim")], channels=2)
    wave, _ = flac.decode_flac(data)
    expected = (left + right) / 2.0  # decoder downmixes to mono
    np.testing.assert_allclose(wave, expected, atol=0.51)


def test_corrupt_stream_raises(flac):
    with pytest.raises(ValueError):
        flac.decode_flac(b"fLaC" + b"\x00" * 10)
    with pytest.raises(ValueError):
        flac.decode_flac(b"not a flac file")


def _lpc1_subframe(b, samples, bps):
    """LPC order 1, coeff=1 at shift 0 (pred = prev sample)."""
    b.write(0, 1)
    b.write(0x20 | 0, 6)  # LPC, order 1
    b.write(0, 1)
    b.write_signed(int(samples[0]), bps)
    b.write(4, 4)         # precision - 1 -> 5 bits
    b.write_signed(0, 5)  # shift 0
    b.write_signed(1, 5)  # coefficient 1
    resid = [int(samples[i]) - int(samples[i - 1])
             for i in range(1, len(samples))]
    b.write(0, 2)
    b.write(0, 4)
    rice = 4
    b.write(rice, 4)
    for r in resid:
        u = (2 * r) if r >= 0 else (-2 * r - 1)
        q, rem = u >> rice, u & ((1 << rice) - 1)
        for _ in range(q):
            b.write(0, 1)
        b.write(1, 1)
        b.write(rem, rice)


def test_lpc_order1_roundtrip(flac):
    t = np.arange(64)
    samples = (200 * np.cos(t / 7.0)).astype(np.int64)
    b = BitWriter()
    _frame_header(b, len(samples), 0, 4)
    _lpc1_subframe(b, samples, 16)
    b.align()
    b.write(0, 16)
    data = (b"fLaC" + _streaminfo(16000, 1, 16, len(samples))
            + bytes(b.bytes))
    wave, _ = flac.decode_flac(data)
    np.testing.assert_array_equal(wave.astype(np.int64), samples)
