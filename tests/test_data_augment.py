import numpy as np

from pautdx.data.augment import (
    RealisticNoise, make_batch_augment, pad_resample_sequence, resample_1d,
)


def test_resample_identity():
    x = np.random.default_rng(0).normal(size=(3, 64)).astype(np.float32)
    assert np.allclose(resample_1d(x, 64), x)
    y = resample_1d(x, 128)
    assert y.shape == (3, 128)
    assert np.allclose(y[:, 0], x[:, 0]) and np.allclose(y[:, -1], x[:, -1])


def test_pad_resample_positions_rescaled(rng):
    L, S = 5, 320
    signals = np.zeros((L, S), np.float32)
    signals[:, 160] = 1.0  # spike at normalized 0.5
    positions = np.tile(np.array([[0.4, 0.6]], np.float32), (L, 1))
    out_sig, out_pos = pad_resample_sequence(signals, positions, rng, (100, 100),
                                             varying=False)
    # pad 100: new normalized position = (100 + p*320)/420
    expected = (100 + positions * 320) / 420.0
    assert np.allclose(out_pos, expected, atol=1e-5)
    # spike moved to ~ (100+160)/420
    peak = out_sig[0].argmax() / S
    assert abs(peak - (260 / 420)) < 0.02
    # healthy positions (0,0) stay (0,0)
    zero_pos = np.zeros((L, 2), np.float32)
    _, zp = pad_resample_sequence(signals, zero_pos, rng, (100, 100), varying=False)
    assert np.allclose(zp, 0.0)


def test_realistic_noise_shape_preserved(rng):
    noise = RealisticNoise(prob=1.0)
    sig = np.random.default_rng(1).normal(size=(10, 320)).astype(np.float32)
    out = noise(sig, rng)
    assert out.shape == sig.shape
    assert np.isfinite(out).all()
    assert not np.allclose(out, sig)  # something changed


def test_batch_augment(rng):
    aug = make_batch_augment(pad_range=(50, 60), noise=RealisticNoise(1.0),
                             pad_prob=1.0)
    batch = {
        "signals": np.random.default_rng(2).normal(size=(2, 5, 320)).astype(np.float32),
        "positions": np.zeros((2, 5, 2), np.float32),
        "labels": np.zeros((2, 5), np.float32),
        "sample_mask": np.ones((2,), np.float32),
    }
    out = aug(batch, rng)
    assert out["signals"].shape == batch["signals"].shape
    assert np.isfinite(out["signals"]).all()
