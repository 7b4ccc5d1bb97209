"""Linear SVM probe, trained on-device.

In-repo replacement for the reference's sklearn `SVC(C, kernel='linear')`
probe (`pretrain.py:252`, `eval_fewshot.py:116`, `eval_zeroshot.py:86-115`):
a one-vs-rest L2-regularized squared-hinge linear classifier (the LIBLINEAR
default objective), minimized full-batch with Adam in jit. The feature
matrices involved ([~10k, 512]) make each training run a handful of MXU
matmuls, so the per-epoch probe that dominates the reference's eval wall
time runs on the TPU instead of a rank-replicated CPU solver.

`fit_svm(..., backend="sklearn")` delegates to sklearn when exact
libsvm/one-vs-one behavior is wanted and the package is present.

Fidelity at checkpoint-gate scale (tests/test_svm_scale.py, [10k, 512]
features, 40/15 classes, C in {0.03, 0.1, 1.0}): at high class
separability both backends agree within noise; at low separability the
OVR squared-hinge objective scores a few points HIGHER than one-vs-one
libsvm (e.g. 42.9% vs 37.1% at 15 classes), uniformly across C. Both
backends rank simulated checkpoints of increasing feature quality
identically, which is the property the best-checkpoint gate
(`cli/pretrain.py`) actually relies on.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass
class LinearSVM:
    w: np.ndarray | None  # [D, K]
    b: np.ndarray | None  # [K]
    mean: np.ndarray | None = None
    scale: np.ndarray | None = None
    _sk: object = None  # sklearn SVC when backend="sklearn"

    def decision(self, feats: np.ndarray) -> np.ndarray:
        if self._sk is not None:
            return self._sk.decision_function(self._standardize(feats))
        return self._standardize(feats) @ self.w + self.b

    def predict(self, feats: np.ndarray) -> np.ndarray:
        if self._sk is not None:
            return self._sk.predict(self._standardize(feats))
        return np.argmax(self.decision(feats), axis=-1)

    def score(self, feats: np.ndarray, labels: np.ndarray) -> float:
        return float(np.mean(self.predict(feats) == np.asarray(labels)))

    def _standardize(self, feats):
        feats = np.asarray(feats, dtype=np.float32)
        if self.mean is not None:
            feats = (feats - self.mean) / self.scale
        return feats


@partial(jax.jit, static_argnames=("num_classes", "steps"))
def _train_ovr(
    x: Array, y: Array, num_classes: int, c: float, steps: int = 300
) -> tuple[Array, Array]:
    """One-vs-rest squared-hinge: min 0.5|w|^2 + C sum max(0, 1 - y f)^2.

    All K binary problems train simultaneously (w is [D, K]); Adam
    full-batch. Returns (w, b)."""
    n, d = x.shape
    targets = jnp.where(
        jax.nn.one_hot(y, num_classes, dtype=jnp.float32) > 0, 1.0, -1.0
    )  # [N, K]

    def loss_fn(params):
        w, b = params
        f = x @ w + b  # [N, K]
        margin = jnp.maximum(0.0, 1.0 - targets * f)
        return 0.5 * jnp.sum(w * w) + c * jnp.sum(margin**2)

    w0 = jnp.zeros((d, num_classes), jnp.float32)
    b0 = jnp.zeros((num_classes,), jnp.float32)

    import optax

    # lr annealed over steps; full-batch Adam converges fast on this convex
    # objective
    sched = optax.cosine_decay_schedule(0.05, steps)
    tx = optax.adam(sched)
    opt_state = tx.init((w0, b0))

    def body(i, carry):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state

    (w, b), _ = jax.lax.fori_loop(0, steps, body, ((w0, b0), opt_state))
    return w, b


def fit_svm(
    feats: np.ndarray,
    labels: np.ndarray,
    c: float = 1.0,
    num_classes: int | None = None,
    standardize: bool = False,
    backend: str = "jax",
    steps: int = 300,
) -> LinearSVM:
    feats = np.asarray(feats, dtype=np.float32)
    labels = np.asarray(labels).reshape(-1)
    num_classes = num_classes or int(labels.max()) + 1
    mean = scale = None
    if standardize:
        mean = feats.mean(axis=0)
        scale = feats.std(axis=0) + 1e-8
        feats = (feats - mean) / scale
    if backend == "sklearn":
        from sklearn.svm import SVC

        sk = SVC(C=c, kernel="linear")
        sk.fit(feats, labels)
        svm = LinearSVM(w=None, b=None, mean=mean, scale=scale)
        svm._sk = sk
        return svm
    w, b = _train_ovr(
        jnp.asarray(feats), jnp.asarray(labels), num_classes, c, steps
    )
    return LinearSVM(
        w=np.asarray(w), b=np.asarray(b), mean=mean, scale=scale
    )


# --------------------------------------------------------------------------
# RBF-kernel SVM + grid search (in-repo replacements for the reference's
# `SVC(kernel='rbf')` and `GridSearchCV` probes, eval_zeroshot.py:86-115)


def _sq_dists(a: Array, b: Array) -> Array:
    """Pairwise squared distances via the matmul identity (MXU-friendly)."""
    aa = jnp.sum(a * a, axis=1, keepdims=True)  # [N, 1]
    bb = jnp.sum(b * b, axis=1, keepdims=True).T  # [1, M]
    ab = a @ b.T
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


@partial(jax.jit, static_argnames=())
def _rbf_matrix(a: Array, b: Array, gamma: Array) -> Array:
    return jnp.exp(-gamma * _sq_dists(a, b))


@partial(jax.jit, static_argnames=("num_classes", "steps"))
def _train_ovr_rbf(
    kmat: Array, y: Array, num_classes: int, c: float, steps: int = 500
) -> tuple[Array, Array]:
    """Kernel primal, one-vs-rest squared hinge:
    min_alpha 0.5 alpha^T K alpha + C sum max(0, 1 - t (K alpha + b))^2,
    all K classes simultaneously with full-batch Adam (K is PSD so the
    objective is convex; Adam's per-coordinate scaling handles the wide
    spread of kernel-row norms)."""
    n = kmat.shape[0]
    targets = jnp.where(
        jax.nn.one_hot(y, num_classes, dtype=jnp.float32) > 0, 1.0, -1.0
    )

    def loss_fn(params):
        alpha, b = params
        ka = kmat @ alpha  # [N, K]
        f = ka + b
        margin = jnp.maximum(0.0, 1.0 - targets * f)
        reg = 0.5 * jnp.sum(alpha * ka)
        return reg + c * jnp.sum(margin**2)

    a0 = jnp.zeros((n, num_classes), jnp.float32)
    b0 = jnp.zeros((num_classes,), jnp.float32)

    import optax

    sched = optax.cosine_decay_schedule(0.02, steps)
    tx = optax.adam(sched)
    opt_state = tx.init((a0, b0))

    def body(i, carry):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state

    (alpha, b), _ = jax.lax.fori_loop(0, steps, body, ((a0, b0), opt_state))
    return alpha, b


@dataclass
class RBFSVM:
    x_train: np.ndarray  # [N, D]
    alpha: np.ndarray | None  # [N, K]
    b: np.ndarray | None  # [K]
    gamma: float
    _sk: object = None

    def decision(self, feats: np.ndarray) -> np.ndarray:
        feats = np.asarray(feats, dtype=np.float32)
        if self._sk is not None:
            return self._sk.decision_function(feats)
        out = []
        xt = jnp.asarray(self.x_train)
        g = jnp.float32(self.gamma)
        for i in range(0, len(feats), 4096):
            k = _rbf_matrix(jnp.asarray(feats[i : i + 4096]), xt, g)
            out.append(np.asarray(k @ jnp.asarray(self.alpha)))
        return np.concatenate(out) + self.b

    def predict(self, feats: np.ndarray) -> np.ndarray:
        if self._sk is not None:
            return self._sk.predict(np.asarray(feats, dtype=np.float32))
        return np.argmax(self.decision(feats), axis=-1)

    def score(self, feats: np.ndarray, labels: np.ndarray) -> float:
        return float(np.mean(self.predict(feats) == np.asarray(labels)))


def scale_gamma(feats: np.ndarray) -> float:
    """sklearn's gamma='scale' default: 1 / (n_features * X.var())."""
    feats = np.asarray(feats, dtype=np.float32)
    return float(1.0 / (feats.shape[1] * feats.var() + 1e-12))


def fit_rbf_svm(
    feats: np.ndarray,
    labels: np.ndarray,
    c: float = 1.0,
    gamma: float | None = None,
    num_classes: int | None = None,
    backend: str = "jax",
    steps: int = 500,
) -> RBFSVM:
    feats = np.asarray(feats, dtype=np.float32)
    labels = np.asarray(labels).reshape(-1)
    num_classes = num_classes or int(labels.max()) + 1
    gamma = scale_gamma(feats) if gamma is None else gamma
    if backend == "sklearn":
        from sklearn.svm import SVC

        sk = SVC(C=c, kernel="rbf", gamma=gamma).fit(feats, labels)
        svm = RBFSVM(x_train=feats, alpha=None, b=None, gamma=gamma)
        svm._sk = sk
        return svm
    kmat = _rbf_matrix(jnp.asarray(feats), jnp.asarray(feats),
                       jnp.float32(gamma))
    alpha, b = _train_ovr_rbf(
        kmat, jnp.asarray(labels), num_classes, c, steps
    )
    return RBFSVM(
        x_train=feats, alpha=np.asarray(alpha), b=np.asarray(b), gamma=gamma
    )


def _stratified_folds(labels: np.ndarray, cv: int, seed: int = 0):
    """Stratified k-fold index lists (sklearn StratifiedKFold semantics:
    per-class round-robin assignment after an order-preserving pass)."""
    labels = np.asarray(labels).reshape(-1)
    rng = np.random.default_rng(seed)
    fold_of = np.zeros(len(labels), dtype=np.int64)
    for cls in np.unique(labels):
        idx = np.flatnonzero(labels == cls)
        rng.shuffle(idx)
        fold_of[idx] = np.arange(len(idx)) % cv
    return [np.flatnonzero(fold_of == f) for f in range(cv)]


def grid_search_svm(
    feats: np.ndarray,
    labels: np.ndarray,
    cs=(0.01, 0.1, 1.0, 10.0),
    kernels=("linear", "rbf"),
    cv: int = 3,
    backend: str = "jax",
    seed: int = 0,
    steps: int = 300,
):
    """Small in-repo GridSearchCV: stratified cv-fold accuracy over the
    {kernel} x {C} grid, refit on the full set with the best combo.

    Returns (fitted_model, best_params_dict, best_mean_val_acc). Matches
    the reference's protocol (`eval_zeroshot.py:97-115`: GridSearchCV over
    kernel/C, cv=3) without sklearn.
    """
    feats = np.asarray(feats, dtype=np.float32)
    labels = np.asarray(labels).reshape(-1)
    if backend == "sklearn":
        from sklearn.model_selection import GridSearchCV
        from sklearn.svm import SVC

        grid = GridSearchCV(
            SVC(), {"kernel": list(kernels), "C": list(cs)}, cv=cv, n_jobs=-1
        ).fit(feats, labels)
        return grid, dict(grid.best_params_), float(grid.best_score_)

    folds = _stratified_folds(labels, cv, seed)
    num_classes = int(labels.max()) + 1

    def _fit(kernel, c, x, y):
        if kernel == "linear":
            return fit_svm(x, y, c=c, num_classes=num_classes, steps=steps)
        return fit_rbf_svm(x, y, c=c, num_classes=num_classes, steps=steps)

    best = (-1.0, None, None)
    for kernel in kernels:
        for c in cs:
            accs = []
            for f in range(cv):
                va = folds[f]
                tr = np.concatenate([folds[g] for g in range(cv) if g != f])
                m = _fit(kernel, c, feats[tr], labels[tr])
                accs.append(m.score(feats[va], labels[va]))
            mean_acc = float(np.mean(accs))
            if mean_acc > best[0]:
                best = (mean_acc, kernel, c)
    mean_acc, kernel, c = best
    model = _fit(kernel, c, feats, labels)
    return model, {"kernel": kernel, "C": c}, mean_acc
