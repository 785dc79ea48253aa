"""utils/metrics: PSNR/SSIM (weights-free, run today) and the LPIPS harness
(validated here against synthetic weight files in the exact torchvision/LPIPS
formats, so real files drop in without code changes)."""

import numpy as np
import pytest

from flux_generator_tpu.utils.metrics import LPIPS, compare_images, psnr, ssim

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def _img(seed, h=32, w=32):
    return np.random.RandomState(seed).rand(h, w, 3)


def test_psnr_basics():
    a = _img(0)
    assert psnr(a, a) == float("inf")
    noisy = np.clip(a + 0.1, 0, 1)
    p = psnr(a, noisy)
    assert 15 < p < 25  # ~20 dB for 0.1 uniform offset


def test_ssim_identity_and_ordering():
    a = _img(1)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    slightly = np.clip(a + 0.02 * _img(2), 0, 1)
    very = np.clip(a + 0.5 * _img(3), 0, 1)
    s1, s2 = ssim(a, slightly), ssim(a, very)
    assert s1 > s2
    assert 0 <= s2 < s1 <= 1.0


def test_ssim_known_value_regression():
    """Pin the implementation: constant-shift SSIM has a closed-ish form via
    the luminance term only (structure/contrast identical)."""
    a = np.full((16, 16, 1), 0.5)
    b = np.full((16, 16, 1), 0.6)
    # mu_a=0.5, mu_b=0.6, sigmas=0 → SSIM = (2*0.3+1e-4)/(0.25+0.36+1e-4) * 1
    want = (2 * 0.5 * 0.6 + 1e-4) / (0.5**2 + 0.6**2 + 1e-4)
    assert ssim(a, b) == pytest.approx(want, rel=1e-6)


def test_ssim_small_image_window_clamp():
    a = _img(4, h=7, w=7)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)


@pytest.fixture(scope="module")
def lpips_weights(tmp_path_factory):
    """Synthetic weight files in the EXACT formats the real ones ship in:
    torchvision vgg16 state dict (features.N.weight OIHW) + LPIPS v0.1 lin
    heads (linN.model.1.weight, (1, C, 1, 1))."""
    torch = pytest.importorskip("torch")
    d = tmp_path_factory.mktemp("lpips")
    g = torch.Generator().manual_seed(0)
    vgg = {}
    idx, cin = 0, 3
    for cout, reps in [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]:
        for _ in range(reps):
            vgg[f"features.{idx}.weight"] = (
                torch.randn(cout, cin, 3, 3, generator=g) * 0.05
            )
            vgg[f"features.{idx}.bias"] = torch.zeros(cout)
            idx += 2
            cin = cout
        idx += 1  # pool
    # torchvision state dicts also carry classifier.* — must be ignored
    vgg["classifier.0.weight"] = torch.zeros(4096, 25088)
    torch.save(vgg, d / "vgg16-397923af.pth")
    lins = {}
    for i, c in enumerate([64, 128, 256, 512, 512]):
        lins[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1, generator=g)
    torch.save(lins, d / "lpips_vgg.pth")
    return d


def test_lpips_loads_and_behaves(lpips_weights):
    lp = LPIPS(lpips_weights)
    a, b = _img(5, 64, 64), _img(6, 64, 64)
    assert lp(a, a) == pytest.approx(0.0, abs=1e-9)
    d_ab = lp(a, b)
    assert d_ab > 0
    # closer images → smaller distance
    near = np.clip(a + 0.01 * (b - a), 0, 1)
    assert lp(a, near) < d_ab


def test_compare_images_bundle(lpips_weights, tmp_path):
    a, b = _img(7, 48, 48), _img(8, 48, 48)
    out = compare_images(a, b, lpips_weights_dir=lpips_weights)
    assert set(out) == {"psnr_db", "ssim", "lpips"}
    # without weights the bundle degrades gracefully
    out2 = compare_images(a, b, lpips_weights_dir=tmp_path)
    assert set(out2) == {"psnr_db", "ssim"}
