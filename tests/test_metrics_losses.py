"""Golden tests: metrics and losses vs torch-computed reference values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pistoseg_tpu.metrics.miou import confusion_matrix, iou_from_confusion, MIoUAccumulator
from pistoseg_tpu.losses.segmentation import dice_loss, cross_entropy_loss
from pistoseg_tpu.losses.revise import (
    multilabel_soft_margin_loss,
    adaptive_min_pooling_loss,
    max_norm,
    max_onehot,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_confusion_matrix_matches_bincount():
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 5, size=(4, 16, 16))       # includes out-of-range 3,4
    pred = rng.randint(0, 3, size=(4, 16, 16))
    n = 3
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), n))
    # reference formula (loss.py:17-24)
    mask = (gt >= 0) & (gt < n)
    label = n * gt[mask].astype(int) + pred[mask]
    ref = np.bincount(label, minlength=n * n).reshape(n, n)
    np.testing.assert_array_equal(cm.astype(int), ref)


def test_iou_from_confusion():
    cm = np.array([[10, 2, 0], [1, 5, 0], [0, 0, 0]], float)
    iou, miou, fwiou = iou_from_confusion(cm)
    assert iou[2] == 0.0                            # NaN -> 0 rule
    np.testing.assert_allclose(iou[0], 10 / 13)
    np.testing.assert_allclose(miou, np.mean([10 / 13, 5 / 8, 0.0]))
    freq = cm.sum(1) / cm.sum()
    np.testing.assert_allclose(fwiou, (freq[:2] * iou[:2]).sum())


def test_miou_accumulator_matches_reference_forward():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 3, 24, 24).astype(np.float32)
    gt = rng.randint(0, 4, size=(2, 24, 24))        # class 3 == background
    acc = MIoUAccumulator(num_classes=3)
    pred = np.asarray(jnp.argmax(jnp.asarray(logits), axis=1))
    acc.add(pred, gt)
    # torch reference path
    pred_t = torch.argmax(torch.from_numpy(logits), dim=1).numpy()
    mask = (gt >= 0) & (gt < 3)
    label = 3 * gt[mask].astype(int) + pred_t[mask]
    ref_cm = np.bincount(label, minlength=9).reshape(3, 3)
    np.testing.assert_array_equal(acc.cm.astype(int), ref_cm)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 4, 8, 8).astype(np.float32)
    target = rng.randint(0, 4, size=(2, 8, 8))
    ref = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(target).long(), ignore_index=3
    ).item()
    got = cross_entropy_loss(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target), ignore_index=3
    )
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)

    ref2 = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(target).long()).item()
    got2 = cross_entropy_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target))
    np.testing.assert_allclose(float(got2), ref2, rtol=1e-5)


def test_dice_loss_basic_properties():
    # perfect prediction -> loss ~ 0
    target = np.zeros((1, 8, 8), np.int32)
    target[:, 4:, :] = 1
    logits = np.full((1, 8, 8, 3), -20.0, np.float32)
    for c in range(3):
        logits[0, ..., c][target[0] == c] = 20.0
    l_perfect = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert l_perfect < 1e-3
    # ignore_index: pixels of the ignored class contribute nothing
    t2 = target.copy()
    t2[:, :2, :] = 3
    l_ign = float(dice_loss(jnp.asarray(logits), jnp.asarray(t2), ignore_index=3))
    assert l_ign < 0.2


def test_dice_loss_matches_smp_formula():
    """Re-derive smp's soft dice by hand in torch and compare."""
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 3, 8, 8).astype(np.float32)
    target = rng.randint(0, 3, size=(2, 8, 8))
    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    onehot = F.one_hot(torch.from_numpy(target).long(), 3).permute(0, 3, 1, 2).float()
    inter = (probs * onehot).sum(dim=(0, 2, 3))
    card = (probs + onehot).sum(dim=(0, 2, 3))
    score = 2 * inter / card.clamp_min(1e-7)
    ref = float((1 - score).mean())
    got = float(dice_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_multilabel_soft_margin_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(4, 3).astype(np.float32)
    y = rng.randint(0, 2, size=(4, 3)).astype(np.float32)
    ref = F.multilabel_soft_margin_loss(torch.from_numpy(x), torch.from_numpy(y)).item()
    got = float(multilabel_soft_margin_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_adaptive_min_pooling_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)  # NCHW for torch
    n, c, h, w = x.shape
    k = h * w // 4
    xt = torch.from_numpy(x)
    m = torch.max(xt, dim=1)[0]
    yk = torch.topk(m.view(n, -1), k=k, dim=-1, largest=False)[0]
    ref = (torch.relu(yk).sum() / (k * n)).item()
    got = float(adaptive_min_pooling_loss(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_max_norm_and_max_onehot_match_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    xt = torch.from_numpy(x.copy())
    n, c, h, w = xt.shape
    mx = torch.max(xt.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    mn = torch.min(xt.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    ref_norm = ((xt - mn) / (mx - mn + 1e-5)).numpy()
    got_norm = np.asarray(max_norm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_norm.transpose(0, 3, 1, 2), ref_norm, rtol=1e-5)

    xt2 = torch.from_numpy(x.copy())
    x_max = torch.max(xt2[:, 1:, :, :], dim=1, keepdim=True)[0]
    xt2[:, 1:, :, :][xt2[:, 1:, :, :] != x_max] = 0
    got_oh = np.asarray(max_onehot(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_oh.transpose(0, 3, 1, 2), xt2.numpy(), atol=1e-6)


def test_confusion_matrix_psum_equivalence():
    """Sharded batch sum == full-batch matrix (all-reduce semantics)."""
    rng = np.random.RandomState(7)
    gt = rng.randint(0, 3, size=(8, 8, 8))
    pred = rng.randint(0, 3, size=(8, 8, 8))
    full = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), 3))
    parts = sum(
        np.asarray(confusion_matrix(jnp.asarray(pred[i : i + 2]), jnp.asarray(gt[i : i + 2]), 3))
        for i in range(0, 8, 2)
    )
    np.testing.assert_array_equal(full, parts)


def test_f1_score():
    from pistoseg_tpu.metrics.miou import f1_score
    pred = np.array([0, 0, 1, 1, 2])
    gt = np.array([0, 1, 1, 1, 0])
    f1 = f1_score(pred, gt, 3)
    # class0: tp=1 fp=1 fn=1 -> 2/4; class1: tp=2 fp=0 fn=1 -> 4/5; class2: tp=0 fp=1 fn=0 -> 0
    np.testing.assert_allclose(f1, [0.5, 0.8, 0.0])


def test_visualize_panel():
    from pistoseg_tpu.core.visualize import visualize_panel
    from pistoseg_tpu.core.config import DATASET_PROFILES
    rng = np.random.RandomState(0)
    fig = visualize_panel(
        DATASET_PROFILES["wsss4luad"].palette,
        image=rng.randint(0, 255, (16, 16, 3), np.uint8),
        mask=rng.randint(0, 4, (16, 16)),
    )
    assert fig is not None
