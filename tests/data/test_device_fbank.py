"""On-device (jit) fbank must match the host python_speech_features
reimplementation (data/audio/log_mel_fbank.py) including CMVN and
per-utterance masking in a padded batch."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _host_feat(wav, nfilt=20):
    from neurst_tpu.data.audio.log_mel_fbank import LogMelFbank
    return LogMelFbank({"nfilt": nfilt})(wav, 16000)


def test_device_fbank_matches_host():
    from neurst_tpu.ops.device_fbank import device_logfbank, num_frames
    rng = np.random.RandomState(0)
    lens = [16000, 12345]
    batch = np.zeros([2, max(lens)], np.float32)
    wavs = []
    for i, n in enumerate(lens):
        w = (rng.randn(n) * 1000).astype(np.float32)
        wavs.append(w)
        batch[i, :n] = w
    feat, fl = device_logfbank(
        jax.numpy.asarray(batch), jax.numpy.asarray(lens, ), nfilt=20)
    feat = np.asarray(feat)
    fl = np.asarray(fl)
    for i, w in enumerate(wavs):
        host = _host_feat(w)
        assert fl[i] == host.shape[0] == num_frames(lens[i])
        got = feat[i, :fl[i]]
        # fp32 rfft vs fp64 numpy: small tolerance on normalized feats
        assert np.max(np.abs(got - host)) < 2e-3, \
            float(np.max(np.abs(got - host)))
        # frames past the utterance end are exactly zero
        assert np.all(feat[i, fl[i]:] == 0.0)


def test_device_fbank_no_cmvn_matches_logfbank():
    from neurst_tpu.data.audio.log_mel_fbank import logfbank
    from neurst_tpu.ops.device_fbank import device_logfbank
    rng = np.random.RandomState(1)
    w = (rng.randn(8000) * 500).astype(np.float32)
    feat, fl = device_logfbank(jax.numpy.asarray(w[None, :]),
                               nfilt=20, cmvn=False)
    host = logfbank(w, nfilt=20)
    assert int(np.asarray(fl)[0]) == host.shape[0]
    assert np.max(np.abs(np.asarray(feat)[0] - host)) < 2e-3
