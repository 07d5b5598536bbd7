"""LPIPS architecture plumbing (random weights — the real ones need
conversion from torchvision, absent in CI)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu2dgs.eval import lpips as lpips_lib


@pytest.fixture(scope="module")
def weights_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    arrays = {}
    idx = 0
    in_ch = 3
    for out_ch, n_convs in lpips_lib._VGG_BLOCKS:
        for _ in range(n_convs):
            arrays[f"conv{idx}_w"] = rng.normal(
                scale=0.05, size=(out_ch, in_ch, 3, 3)).astype(np.float32)
            arrays[f"conv{idx}_b"] = np.zeros(out_ch, np.float32)
            in_ch = out_ch
            idx += 1
    for i in range(5):
        ch = lpips_lib._VGG_BLOCKS[i][0]
        arrays[f"lin{i}_w"] = np.abs(
            rng.normal(size=(ch,)).astype(np.float32))
    path = tmp_path_factory.mktemp("lpips") / "w.npz"
    np.savez(path, **arrays)
    return str(path)


def test_lpips_properties(weights_path):
    fn = lpips_lib.lpips_fn(weights_path)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((3, 64, 64)), jnp.float32)
    b = jnp.asarray(rng.random((3, 64, 64)), jnp.float32)
    # identity -> 0
    assert float(fn(a, a)) == pytest.approx(0.0, abs=1e-6)
    # symmetry
    assert float(fn(a, b)) == pytest.approx(float(fn(b, a)), rel=1e-5)
    # positive for different images
    assert float(fn(a, b)) > 0.0
    # closer image -> smaller distance
    a2 = a + 0.01 * (b - a)
    assert float(fn(a, a2)) < float(fn(a, b))


def test_lpips_missing_weights_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="LPIPS weights not found"):
        lpips_lib.load_weights(str(tmp_path / "nope.npz"))
