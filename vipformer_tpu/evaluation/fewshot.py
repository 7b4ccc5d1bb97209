"""K-way N-shot episodic evaluation (reference `eval_fewshot.py:45-126`).

Protocol reproduced exactly: sample `k_way` classes, `n_shot` support +
`n_query` query examples per class, extract backbone features, standardize
on the support set, fit a linear SVM, score the query set; report mean ± std
over `n_runs`. Feature extraction is batched through one jitted forward
(the reference runs one forward per sample, device->host each time).
"""

from __future__ import annotations

import numpy as np

from vipformer_tpu.evaluation.svm import fit_svm


def _episode_indices(rng, labels, k_way, n_shot, n_query):
    # only classes with enough examples can host an episode
    classes = np.array(
        [
            c
            for c in np.unique(labels)
            if (labels == c).sum() >= n_shot + n_query
        ]
    )
    if len(classes) < k_way:
        raise ValueError(
            f"only {len(classes)} classes have >= {n_shot + n_query} "
            f"samples; cannot sample {k_way}-way episodes"
        )
    chosen = rng.choice(classes, size=k_way, replace=False)
    sup_idx, qry_idx, sup_y, qry_y = [], [], [], []
    for new_label, c in enumerate(chosen):
        idx = np.flatnonzero(labels == c)
        picked = rng.choice(idx, size=n_shot + n_query, replace=False)
        sup_idx.extend(picked[:n_shot])
        qry_idx.extend(picked[n_shot:])
        sup_y.extend([new_label] * n_shot)
        qry_y.extend([new_label] * n_query)
    return (
        np.array(sup_idx), np.array(sup_y),
        np.array(qry_idx), np.array(qry_y),
    )


def fewshot_eval(
    feats: np.ndarray,
    labels: np.ndarray,
    k_way: int,
    n_shot: int,
    n_query: int,
    n_runs: int,
    c: float = 1.0,
    seed: int = 0,
    backend: str = "jax",
) -> tuple[float, float, list[float]]:
    """Episodic eval over precomputed features -> (mean, std, per-run accs).

    Features are extracted once for the whole pool; episodes only index into
    them (identical statistics, ~n_runs x fewer forwards than the reference).
    """
    rng = np.random.default_rng(seed)
    labels = np.asarray(labels).reshape(-1)
    accs = []
    for _ in range(n_runs):
        si, sy, qi, qy = _episode_indices(rng, labels, k_way, n_shot, n_query)
        svm = fit_svm(
            feats[si], sy, c=c, num_classes=k_way, standardize=True,
            backend=backend,
        )
        accs.append(svm.score(feats[qi], qy) * 100.0)
    return float(np.mean(accs)), float(np.std(accs)), accs
