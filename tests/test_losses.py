"""Golden tests: JAX losses vs the reference's torch formulas.

The torch expressions below re-state the reference math
(training.py:517-566, losses.py:7-126) independently on CPU; the JAX
implementations must match to fp32 tolerance (BASELINE.json parity bar).
Layout note: torch is NCDHW, ours is NDHWC.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu as bt
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import losses

B, D, H, W, C = 2, 8, 8, 8, 4


@pytest.fixture
def data(rng):
    logits = rng.normal(size=(B, D, H, W, C)).astype(np.float32)
    targets = rng.integers(0, C, size=(B, D, H, W)).astype(np.int32)
    return logits, targets


def _torch(logits, targets):
    lt = torch.from_numpy(logits).permute(0, 4, 1, 2, 3).contiguous()
    tt = torch.from_numpy(targets).long()
    return lt, tt


def torch_dice(lt, tt, smooth):
    p = F.softmax(lt, dim=1)
    oh = F.one_hot(tt, C).permute(0, 4, 1, 2, 3).float()
    inter = (p * oh).sum(dim=(2, 3, 4))
    union = p.sum(dim=(2, 3, 4)) + oh.sum(dim=(2, 3, 4))
    return (1 - ((2 * inter + smooth) / (union + smooth)).mean()).item()


def torch_focal(lt, tt, alpha, gamma):
    ce = F.cross_entropy(lt, tt, reduction="none")
    pt = torch.exp(-ce)
    return (alpha * (1 - pt) ** gamma * ce).mean().item()


def test_dice_loss(data):
    logits, targets = data
    lt, tt = _torch(logits, targets)
    got = float(losses.softmax_dice_loss(logits, targets))
    assert got == pytest.approx(torch_dice(lt, tt, 1e-6), abs=1e-5)


def test_cross_entropy(data):
    logits, targets = data
    lt, tt = _torch(logits, targets)
    want = F.cross_entropy(lt, tt).item()
    assert float(losses.cross_entropy_loss(logits, targets)) == \
        pytest.approx(want, abs=1e-5)


def test_focal_loss(data):
    logits, targets = data
    lt, tt = _torch(logits, targets)
    got = float(losses.focal_loss(logits, targets))
    assert got == pytest.approx(torch_focal(lt, tt, 1.0, 2.0), abs=1e-5)


def test_combined_loss(data):
    logits, targets = data
    lt, tt = _torch(logits, targets)
    want = (0.5 * torch_dice(lt, tt, 1e-6)
            + 0.3 * F.cross_entropy(lt, tt).item()
            + 0.2 * torch_focal(lt, tt, 1.0, 2.0))
    assert float(losses.combined_loss(logits, targets)) == \
        pytest.approx(want, abs=1e-5)
    # class-style shim
    assert float(losses.CombinedLoss()(logits, targets)) == \
        pytest.approx(want, abs=1e-5)


def test_tversky_loss(data):
    logits, targets = data
    lt, tt = _torch(logits, targets)
    p = F.softmax(lt, dim=1)
    oh = F.one_hot(tt, C).permute(0, 4, 1, 2, 3).float()
    tp = (p * oh).sum(dim=(2, 3, 4))
    fp = (p * (1 - oh)).sum(dim=(2, 3, 4))
    fn = ((1 - p) * oh).sum(dim=(2, 3, 4))
    want = (1 - ((tp + 1e-5) / (tp + 0.7 * fp + 0.3 * fn + 1e-5)).mean()
            ).item()
    assert float(losses.tversky_loss(logits, targets)) == \
        pytest.approx(want, abs=1e-5)


def test_boundary_loss(data):
    logits, targets = data
    lt, tt = _torch(logits, targets)
    p = F.softmax(lt, dim=1)
    oh = F.one_hot(tt, C).permute(0, 4, 1, 2, 3).float()

    def grad3d(t):
        gx = torch.abs(t[:, :, 1:] - t[:, :, :-1])
        gy = torch.abs(t[:, :, :, 1:] - t[:, :, :, :-1])
        gz = torch.abs(t[:, :, :, :, 1:] - t[:, :, :, :, :-1])
        gx = F.pad(gx, (0, 0, 0, 0, 0, 1))
        gy = F.pad(gy, (0, 0, 0, 1, 0, 0))
        gz = F.pad(gz, (0, 1, 0, 0, 0, 0))
        return gx + gy + gz

    want = F.mse_loss(grad3d(p), grad3d(oh)).item()
    assert float(losses.boundary_loss(logits, targets)) == \
        pytest.approx(want, abs=1e-5)


def test_combined_loss3d_parts(data):
    logits, targets = data
    total, parts = losses.combined_loss3d(logits, targets)
    want = (0.5 * parts["dice_loss"] + 0.3 * parts["focal_loss"]
            + 0.2 * parts["boundary_loss"])
    assert float(total) == pytest.approx(float(want), rel=1e-6)
    assert float(parts["total_loss"]) == pytest.approx(float(total))


def test_deep_supervision_weighting(data):
    logits, targets = data
    deep = [logits * 0.5, logits * 0.25]
    fn = losses.combined_loss
    want = (1.0 * fn(logits, targets) + 0.8 * fn(deep[0], targets)
            + 0.6 * fn(deep[1], targets))
    got = losses.deep_supervision_loss(logits, deep, targets)
    assert float(got) == pytest.approx(float(want), rel=1e-6)
    # dict-style (model output) through the class shim with plain loss_fn
    shim = losses.DeepSupervisionLoss3D(loss_fn=fn)
    got2 = shim({"logits": logits, "deep": deep}, targets)
    assert float(got2) == pytest.approx(float(want), rel=1e-6)


def test_losses_differentiable(data):
    import jax
    logits, targets = data
    g = jax.grad(lambda lg: losses.combined_loss(lg, targets))(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda lg: losses.combined_loss3d(lg, targets)[0])(logits)
    assert np.all(np.isfinite(np.asarray(g2)))
