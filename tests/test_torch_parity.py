"""Golden parity: reference-architecture torch models vs this framework
with IMPORTED weights — forward outputs must match at fp32 tolerance
(BASELINE.json: 'segmentation masks matching the reference bit-for-bit
at fp32 tolerance').

The torch models below are built to the reference's architecture spec
(SURVEY.md section 2.1; module layout of main.py:102-328) so their
state_dict keys match real reference checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import models
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.torch_interop import (
    export_unet3d_to_torch, import_classifier_from_torch,
    import_unet3d_from_torch)

FEATS = (8, 16)
IN_CH = 4


# ---- reference-architecture torch modules (spec: SURVEY.md 2.1) ----

class TDoubleConv(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.double_conv = tnn.Sequential(
            tnn.Conv3d(cin, cout, 3, padding=1, bias=False),
            tnn.GroupNorm(8, cout), tnn.ReLU(inplace=True),
            tnn.Conv3d(cout, cout, 3, padding=1, bias=False),
            tnn.GroupNorm(8, cout), tnn.ReLU(inplace=True))
        if cin == cout:
            self.residual = tnn.Identity()
        else:
            self.residual = tnn.Sequential(
                tnn.Conv3d(cin, cout, 1, bias=False),
                tnn.GroupNorm(8, cout))

    def forward(self, x):
        return self.double_conv(x) + self.residual(x)


class TAttGate(tnn.Module):
    def __init__(self, fg, fl, fint):
        super().__init__()
        self.W_g = tnn.Sequential(tnn.Conv3d(fg, fint, 1),
                                  tnn.GroupNorm(4, fint))
        self.W_x = tnn.Sequential(tnn.Conv3d(fl, fint, 1),
                                  tnn.GroupNorm(4, fint))
        self.psi = tnn.Sequential(tnn.Conv3d(fint, 1, 1),
                                  tnn.GroupNorm(1, 1), tnn.Sigmoid())
        self.channel_attention = tnn.Sequential(
            tnn.AdaptiveAvgPool3d(1),
            tnn.Conv3d(fl, max(fl // 8, 1), 1), tnn.ReLU(inplace=True),
            tnn.Conv3d(max(fl // 8, 1), fl, 1), tnn.Sigmoid())

    def forward(self, g, x):
        g1, x1 = self.W_g(g), self.W_x(x)
        if g1.shape[2:] != x1.shape[2:]:
            g1 = tF.interpolate(g1, size=x1.shape[2:], mode="trilinear",
                                align_corners=False)
        psi = self.psi(tF.relu(g1 + x1))
        return x * psi * self.channel_attention(x)


class TUNet(tnn.Module):
    def __init__(self, cin=IN_CH, cout=4, feats=FEATS):
        super().__init__()
        self.downs = tnn.ModuleList()
        c = cin
        for f in feats:
            self.downs.append(TDoubleConv(c, f))
            c = f
        self.pool = tnn.MaxPool3d(2, 2)
        self.bottleneck = TDoubleConv(feats[-1], feats[-1] * 2)
        self.ups = tnn.ModuleList()
        for f in reversed(feats):
            self.ups.append(tnn.ConvTranspose3d(f * 2, f, 2, 2))
            self.ups.append(TAttGate(f, f, f // 2))
            self.ups.append(TDoubleConv(f * 2, f))
        self.final_conv = tnn.Sequential(
            tnn.Conv3d(feats[0], feats[0] // 2, 3, padding=1),
            tnn.BatchNorm3d(feats[0] // 2), tnn.ReLU(inplace=True),
            tnn.Conv3d(feats[0] // 2, cout, 1))
        self.deep_supervision = tnn.ModuleList(
            [tnn.Conv3d(f, cout, 1) for f in feats[:-1]])

    def forward(self, x):
        skips = []
        for d in self.downs:
            x = d(x)
            skips.append(x)
            x = self.pool(x)
        x = self.bottleneck(x)
        skips = skips[::-1]
        for i in range(0, len(self.ups), 3):
            x = self.ups[i](x)
            att = self.ups[i + 1](g=x, x=skips[i // 3])
            x = self.ups[i + 2](torch.cat((att, x), dim=1))
        return self.final_conv(x)


class TClassifier(tnn.Module):
    def __init__(self, n=4):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv3d(4, 32, 3, 1, 1), tnn.ReLU(), tnn.MaxPool3d(2),
            tnn.Conv3d(32, 64, 3, 1, 1), tnn.ReLU(), tnn.MaxPool3d(2),
            tnn.Conv3d(64, 128, 3, 1, 1), tnn.ReLU(),
            tnn.AdaptiveAvgPool3d((4, 4, 4)))
        self.classifier = tnn.Sequential(
            tnn.Linear(128 * 64, 512), tnn.ReLU(), tnn.Dropout(0.5),
            tnn.Linear(512, n))

    def forward(self, x):
        x = self.features(x)
        return self.classifier(x.view(x.size(0), -1))


@pytest.fixture(scope="module")
def torch_unet():
    torch.manual_seed(0)
    m = TUNet().eval()
    # randomize BN stats so interop of running stats is exercised
    with torch.no_grad():
        m.final_conv[1].running_mean.uniform_(-0.2, 0.2)
        m.final_conv[1].running_var.uniform_(0.7, 1.4)
    return m


@pytest.mark.parametrize("fast", [True, False])
def test_unet_forward_parity(rng, torch_unet, fast):
    x = rng.normal(size=(1, 16, 16, 16, IN_CH)).astype(np.float32)
    with torch.no_grad():
        want = torch_unet(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy().transpose(0, 2, 3, 4, 1)

    params, batch_stats = import_unet3d_from_torch(
        torch_unet.state_dict(), in_channels=IN_CH, features=FEATS)
    model = models.UNet3D(out_channels=4, features=FEATS,
                          dtype=jnp.float32, fast=fast)
    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)},
        jnp.asarray(x), train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                               rtol=2e-3)
    # and the argmax masks agree everywhere except ties
    agree = (np.argmax(np.asarray(got), -1) == np.argmax(want, -1)).mean()
    assert agree > 0.999


def test_unet_export_roundtrip(torch_unet):
    sd = torch_unet.state_dict()
    params, bs = import_unet3d_from_torch(sd, IN_CH, FEATS)
    back = export_unet3d_to_torch(params, bs, FEATS)
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_allclose(back[k], v.numpy(), atol=1e-7,
                                   err_msg=k)


def test_classifier_forward_parity(rng):
    torch.manual_seed(1)
    tm = TClassifier().eval()
    x = rng.normal(size=(2, 16, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    params = import_classifier_from_torch(tm.state_dict())
    model = models.BrainTumorClassifier(num_classes=4, dtype=jnp.float32)
    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                               rtol=1e-4)


def test_pth_file_roundtrip(tmp_path, torch_unet, rng):
    """.pth save/load through the reference checkpoint format."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.torch_interop import (
        load_torch_checkpoint, save_torch_checkpoint)
    params, bs = import_unet3d_from_torch(torch_unet.state_dict(),
                                          IN_CH, FEATS)
    p = str(tmp_path / "best.pth")
    save_torch_checkpoint(p, params, bs, FEATS)
    # also via the reference trainer's wrapper dict shape
    wrapped = str(tmp_path / "ckpt.pth")
    torch.save({"model_state_dict": torch.load(p, weights_only=False),
                "best_dice": 0.9}, wrapped)
    for path in (p, wrapped):
        params2, bs2 = load_torch_checkpoint(path, IN_CH, FEATS)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_step_timer():
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.profiling import (
        StepTimer)
    t = StepTimer(sync_every=2)
    x = jnp.ones(4)
    for _ in range(6):
        t.tick(x)
    s = t.summary()
    assert s["steps"] == 6 and s["steps_per_sec"] > 0
