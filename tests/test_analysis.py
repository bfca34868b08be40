"""Analysis helpers: confusion, efficiency/purity, ROC/AUC."""

import numpy as np

from sparseeventid_tpu.utils.analysis import (
    auc,
    confusion_matrix,
    efficiency_purity,
    roc_curve,
    summarize_predictions,
)


def test_confusion_and_efficiency():
    labels = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 1, 1, 1, 2, 0])
    cm = confusion_matrix(labels, preds, 3)
    assert cm.sum() == 6
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 2
    stats = efficiency_purity(labels, preds, 3)
    np.testing.assert_allclose(stats["efficiency"], [0.5, 1.0, 0.5])


def test_roc_perfect_classifier():
    labels = np.array([0, 0, 1, 1])
    scores = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9], [0.2, 0.8]])
    fpr, tpr, _ = roc_curve(labels, scores, signal_class=1)
    assert auc(fpr, tpr) == 1.0


def test_summarize_predictions():
    rng = np.random.default_rng(0)
    labels = {"labelneutID": rng.integers(0, 3, 100)}
    scores = rng.random((100, 3))
    scores[np.arange(100), labels["labelneutID"]] += 2.0  # mostly correct
    out = summarize_predictions({"labelneutID": scores}, labels)
    s = out["labelneutID"]
    assert s["accuracy"] == 1.0
    assert s["auc"] > 0.9
