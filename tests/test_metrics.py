"""Metrics library vs sklearn oracle (sklearn is what the reference calls —
testing.py:290-312, advanced_metrics.py)."""

import numpy as np
import pytest
from sklearn import metrics as sk

from facerec_tpu.eval import metrics as fm


@pytest.fixture(scope="module")
def preds():
    rng = np.random.default_rng(0)
    n, c = 200, 5
    y = rng.integers(0, c, n)
    logits = rng.normal(size=(n, c)) + 2.0 * np.eye(c)[y]
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    yhat = probs.argmax(1)
    return y, yhat, probs


def test_accuracy_prf(preds):
    y, yhat, _ = preds
    assert fm.accuracy(y, yhat) == pytest.approx(sk.accuracy_score(y, yhat))
    p, r, f1 = fm.precision_recall_f1(y, yhat, "weighted")
    assert p == pytest.approx(sk.precision_score(y, yhat, average="weighted", zero_division=0))
    assert r == pytest.approx(sk.recall_score(y, yhat, average="weighted", zero_division=0))
    assert f1 == pytest.approx(sk.f1_score(y, yhat, average="weighted", zero_division=0))


def test_confusion_matrix(preds):
    y, yhat, _ = preds
    np.testing.assert_array_equal(fm.confusion_matrix(y, yhat), sk.confusion_matrix(y, yhat))


def test_roc_auc_binary(preds):
    y, _, probs = preds
    mask = y == 2
    scores = probs[:, 2]
    assert fm.roc_auc_score(mask, scores) == pytest.approx(sk.roc_auc_score(mask, scores))
    fpr, tpr, _ = fm.roc_curve(mask, scores)
    sfpr, stpr, _ = sk.roc_curve(mask, scores)
    np.testing.assert_allclose(np.interp([0.1, 0.3, 0.7], fpr, tpr),
                               np.interp([0.1, 0.3, 0.7], sfpr, stpr), atol=1e-9)


def test_roc_auc_ovr(preds):
    y, _, probs = preds
    assert fm.roc_auc_ovr(y, probs, "macro") == pytest.approx(
        sk.roc_auc_score(y, probs, multi_class="ovr", average="macro"))
    assert fm.roc_auc_ovr(y, probs, "weighted") == pytest.approx(
        sk.roc_auc_score(y, probs, multi_class="ovr", average="weighted"))


def test_average_precision(preds):
    y, _, probs = preds
    mask = y == 1
    assert fm.average_precision(mask, probs[:, 1]) == pytest.approx(
        sk.average_precision_score(mask, probs[:, 1]))


def test_per_class_and_enhanced(preds):
    y, yhat, probs = preds
    pc = fm.per_class_metrics(y, yhat, probs)
    rep = sk.classification_report(y, yhat, output_dict=True, zero_division=0)
    for c in range(5):
        assert pc[str(c)]["precision"] == pytest.approx(rep[str(c)]["precision"])
        assert pc[str(c)]["recall"] == pytest.approx(rep[str(c)]["recall"])
        assert pc[str(c)]["support"] == rep[str(c)]["support"]
    enh = fm.enhanced_confusion_matrix(y, yhat)
    assert set(enh["per_class"]) == {str(i) for i in range(5)}
    tp_sum = sum(v["true_positives"] for v in enh["per_class"].values())
    assert tp_sum == int((y == yhat).sum())


def test_ece_bounds(preds):
    y, _, probs = preds
    out = fm.expected_calibration_error(y, probs)
    assert 0.0 <= out["ece"] <= 1.0
    assert out["ece"] <= out["mce"] <= 1.0
    # perfectly calibrated one-hot predictions that are all correct -> ECE 0
    onehot = np.eye(5)[y] * 0.999 + 0.0002
    assert fm.expected_calibration_error(y, onehot)["ece"] == pytest.approx(0.0, abs=1e-3)
