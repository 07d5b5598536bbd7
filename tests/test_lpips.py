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


def test_lpips_matches_torch_reimplementation(weights_path):
    """Numerical parity of the JAX LPIPS math against an independent torch
    evaluation of the same architecture with the same (random) weights —
    proves conv arithmetic, scaling layer, unit normalization, and the
    linear-head reduction match the reference formulation
    (/root/reference/lpipsPyTorch/modules/lpips.py:8-36). With the real
    converted npz, test_lpips_golden extends this to the released weights."""
    import torch
    import torch.nn.functional as F

    z = np.load(weights_path)
    rng = np.random.default_rng(3)
    a = rng.random((3, 32, 32)).astype(np.float32)
    b = rng.random((3, 32, 32)).astype(np.float32)

    def torch_lpips(x, y):
        def feats(img):
            h = torch.from_numpy(img[None] * 2.0 - 1.0)
            shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
            scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
            h = (h - shift) / scale
            out = []
            idx = 0
            for bi, (ch, n_convs) in enumerate(lpips_lib._VGG_BLOCKS):
                for _ in range(n_convs):
                    w = torch.from_numpy(z[f"conv{idx}_w"])
                    bias = torch.from_numpy(z[f"conv{idx}_b"])
                    h = F.relu(F.conv2d(h, w, bias, padding=1))
                    idx += 1
                out.append(h)
                if bi < 4:
                    h = F.max_pool2d(h, 2)
            return out

        fa, fb = feats(x), feats(y)
        total = 0.0
        for i, (u, v) in enumerate(zip(fa, fb)):
            u = u / (u.norm(dim=1, keepdim=True) + 1e-10)
            v = v / (v.norm(dim=1, keepdim=True) + 1e-10)
            lin = torch.from_numpy(z[f"lin{i}_w"]).view(1, -1, 1, 1)
            total = total + ((u - v) ** 2 * lin).sum(dim=1).mean()
        return float(total)

    fn = lpips_lib.lpips_fn(weights_path)
    got = float(fn(jnp.asarray(a), jnp.asarray(b)))
    want = torch_lpips(a, b)
    assert got == pytest.approx(want, rel=1e-4), (got, want)


def test_lpips_golden():
    """Parity against the pip `lpips` reference on the released weights.
    Runs only when scripts/fetch_lpips_weights.py has produced the npz
    (requires network; see that script)."""
    import os
    path = lpips_lib.default_weights_path()
    if not os.path.exists(path):
        pytest.skip("real LPIPS weights not fetched (no network in CI)")
    z = np.load(path)
    if "golden_ab" not in z:
        pytest.skip("npz has no goldens (pip lpips absent at fetch time)")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from fetch_lpips_weights import golden_pair

    a, b = golden_pair()
    fn = lpips_lib.lpips_fn(path)
    assert float(fn(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(z["golden_ab"]), rel=1e-3)
    assert float(fn(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(
        float(z["golden_aa"]), abs=1e-5)
