"""Vector quantizers for semantic-ID tokenization.

Reference: TIGER/quantizer.py:11-321 — CodeBook estimators (straight-
through :70-72, gumbel-softmax :74-80, rotation trick :82-95),
ResidualQuantizer (+Gumbel/Rotation variants), ResidualSimVQ (frozen
base codebooks + trainable projections), ProductQuantizer; optional
Sinkhorn-balanced assignment (TIGER/utils.py:80-105).

All quantizers are flax modules over (B, D) latents returning
(z_hat, aux_loss, ids). The Sinkhorn iterations and code matching run
inside jit (static iteration counts); k-means codebook init happens
host-side (sem/kmeans.py) and is passed in via `codebook_init`.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "sinkhorn_assignment",
    "ResidualQuantizer",
    "ResidualSimVQQuantizer",
    "ProductQuantizer",
    "RatingResidualQuantizer",
]


def _center_distance(dist: jnp.ndarray) -> jnp.ndarray:
    """Center distances for Sinkhorn stability (TIGER/utils.py:70-78)."""
    max_d = dist.max()
    min_d = dist.min()
    middle = (max_d + min_d) / 2
    amplitude = jnp.maximum((max_d - min_d) / 2, 1e-5)
    return (dist - middle) / amplitude


def sinkhorn_assignment(
    dist: jnp.ndarray, epsilon: float, iterations: int
) -> jnp.ndarray:
    """Balanced soft assignment Q from a (B, K) distance matrix
    (TIGER/utils.py:80-105); argmax(Q) gives balanced hard codes."""
    d = _center_distance(dist).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    Q = jnp.exp(-d / epsilon)
    B, K = Q.shape
    Q = Q / Q.sum()

    def body(_, Q):
        Q = Q / Q.sum(axis=1, keepdims=True) / B
        Q = Q / Q.sum(axis=0, keepdims=True) / K
        return Q

    Q = jax.lax.fori_loop(0, iterations, body, Q)
    return (Q * B).astype(dist.dtype)


def _cdist(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances (B, K) via the matmul decomposition."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(codebook * codebook, axis=-1)
    d2 = x2 - 2 * jnp.einsum(
        "bd,kd->bk", x, codebook, preferred_element_type=jnp.float32
    ) + c2[None]
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def straight_through(z: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return z + jax.lax.stop_gradient(q - z)


def rotation_trick(z: jnp.ndarray, q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Householder-style rotation estimator (TIGER/quantizer.py:82-95)."""
    q = jax.lax.stop_gradient(q)
    z_d = jax.lax.stop_gradient(z)
    z_norm = jnp.maximum(jnp.linalg.norm(z_d, axis=-1, keepdims=True), eps)
    q_norm = jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
    scale = q_norm / z_norm
    u = z_d / jnp.maximum(jnp.linalg.norm(z_d, axis=-1, keepdims=True), eps)
    v = q / q_norm
    r = u + v
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), eps)
    z_on_r = jnp.einsum("bd,bd->b", r, z)[:, None] * r
    z_on_u_to_v = jnp.einsum("bd,bd->b", u, z)[:, None] * v
    return scale * (z - 2 * z_on_r + 2 * z_on_u_to_v)


def _commit(x: jnp.ndarray, y: jnp.ndarray, reduction: str = "sum") -> jnp.ndarray:
    """MSE(x, stopgrad(y)): 'sum' = sum-MSE / B (TIGER/quantizer.py:147-148),
    'mean' = element mean (LETTER/quantizer.py:192-193 F.mse_loss)."""
    sq = jnp.square(x - jax.lax.stop_gradient(y))
    if reduction == "mean":
        return jnp.mean(sq)
    return jnp.sum(sq) / x.shape[0]


class _QuantizerBase(nn.Module):
    codebook_dim: int
    num_codebooks: int = 3
    num_codewords: int = 256
    apply_shared_codebook: bool = False
    commit_weight: float = 0.25
    commit_reduction: str = "sum"  # "sum" (TIGER) | "mean" (LETTER)
    sk_iters: int = 50
    sk_epsilons: Optional[Sequence[float]] = None
    gumbel_temperature: float = 1.0
    estimator: str = "ste"  # ste | gumbel | rotation
    codebook_init: Optional[Callable] = None  # fn(rng, shape) e.g. k-means centers
    # LETTER codebook diversity loss (LETTER/quantizer.py:111-135):
    # per-level cluster tables are threaded in at call time (they are
    # host-refreshed per epoch, not params)
    diversity_weight: float = 0.0
    # TIGER divides the aux loss by num_codebooks (quantizer.py:186);
    # LETTER returns the raw per-level sum (LETTER/quantizer.py:250)
    normalize_loss: bool = True

    def _init(self):
        if self.codebook_init is not None:
            return self.codebook_init
        return nn.initializers.normal(stddev=1.0)

    def setup(self):
        n = 1 if self.apply_shared_codebook else self.num_codebooks
        self._books = [
            self.param(
                f"codebook_{i}", self._init(), (self.num_codewords, self.codebook_dim)
            )
            for i in range(n)
        ]

    def _codebooks(self):
        books = list(self._books)
        if self.apply_shared_codebook:
            books = books * self.num_codebooks
        return books

    def _eps(self, l: int) -> float:
        if self.sk_epsilons is None:
            return 0.0
        return float(self.sk_epsilons[l])

    def embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Hard (deterministic) reconstruction from code indices
        (.., L) → (.., D): the residual sum of codebook rows."""
        books = self._codebooks()
        return sum(books[l][ids[..., l]] for l in range(self.num_codebooks))

    def match(self, x: jnp.ndarray, codebook: jnp.ndarray, l: int):
        dist = _cdist(x, codebook)
        if self._eps(l) > 0.0:
            score = -sinkhorn_assignment(dist, self._eps(l), self.sk_iters)
        else:
            score = dist
        ids = jnp.argmin(score, axis=-1)
        c = codebook[ids]
        return ids, c, dist

    def _estimate(self, z_res, c, dist, codebook, rng):
        if self.estimator == "gumbel":
            g = -jnp.log(-jnp.log(jax.random.uniform(rng, dist.shape) + 1e-20) + 1e-20)
            w = jax.nn.softmax((-dist + g) / self.gumbel_temperature, axis=-1)
            return w @ codebook
        if self.estimator == "rotation":
            return rotation_trick(z_res, c)
        return straight_through(z_res, c)

    def _diversity_loss(self, c, ids_, codebook, tables, level, rng):
        """LETTER diversity loss for one level (LETTER/quantizer.py:111-135):
        for each assigned codeword, a random same-cluster positive is the
        CE target over the selected vector's logits against the codebook
        (own codeword masked out). The reference samples positives with
        host-side random.choice per row; here the per-cluster membership
        is a padded (C, M) table so sampling is one vectorized randint —
        no host work inside the step."""
        labels, members, sizes = tables  # (L, K), (L, C, M), (L, C)
        lab = labels[level][ids_]                       # (B,)
        size = sizes[level][lab]                        # (B,)
        row_members = members[level][lab]               # (B, M)
        own_pos = jnp.argmax(row_members == ids_[:, None], axis=-1)
        # uniform over cluster members excluding self: draw in [0, size-2]
        # then skip past own position
        j = jax.random.randint(rng, ids_.shape, 0, jnp.maximum(size - 1, 1))
        j = j + (j >= own_pos)
        j = jnp.minimum(j, jnp.maximum(size - 1, 0))
        positive = jnp.take_along_axis(row_members, j[:, None], axis=-1)[:, 0]
        logits = jnp.einsum(
            "bd,kd->bk", c, codebook, preferred_element_type=jnp.float32
        )
        own = jax.nn.one_hot(ids_, self.num_codewords, dtype=bool)
        logits = jnp.where(own, -1.0e4, logits)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, positive[:, None], axis=-1)[:, 0]
        valid = (size > 1).astype(ce.dtype)  # singleton cluster: no positive
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


class ResidualQuantizer(_QuantizerBase):
    """Residual VQ: L levels of quantizing the running residual
    (TIGER/quantizer.py:160-221); estimator selects STE/Gumbel/rotation."""

    def __call__(
        self, z: jnp.ndarray, diversity_tables=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        books = self._codebooks()
        rng = (
            self.make_rng("sampling")
            if self.estimator == "gumbel"
            or (self.diversity_weight > 0 and diversity_tables is not None)
            else None
        )
        loss = 0.0
        ids = []
        z_res = z
        z_hat = 0.0
        for l in range(self.num_codebooks):
            ids_, c, dist = self.match(z_res, books[l], l)
            q = self._estimate(
                z_res, c, dist, books[l],
                jax.random.fold_in(rng, l) if rng is not None else None,
            )
            z_hat = z_hat + q
            loss = (
                loss
                + _commit(c, z_res, self.commit_reduction)
                + _commit(z_res, c, self.commit_reduction) * self.commit_weight
            )
            if self.diversity_weight > 0 and diversity_tables is not None:
                loss = loss + self.diversity_weight * self._diversity_loss(
                    c, ids_, books[l], diversity_tables, l,
                    jax.random.fold_in(rng, 100 + l),
                )
            z_res = z_res - q
            ids.append(ids_)
        denom = self.num_codebooks if self.normalize_loss else 1
        return z_hat, loss / denom, jnp.stack(ids, axis=-1)

    def get_indices(self, z: jnp.ndarray) -> jnp.ndarray:
        books = self._codebooks()
        ids = []
        z_res = z
        for l in range(self.num_codebooks):
            ids_, c, _ = self.match(z_res, books[l], l)
            z_res = z_res - c
            ids.append(ids_)
        return jnp.stack(ids, axis=-1)

    def quantize_with_logits(self, z: jnp.ndarray):
        """(z_hat, loss, ids, logits (B, L, K)) — per-level negative
        distances as code logits (ETEGRec's tokenizer output)."""
        books = self._codebooks()
        loss = 0.0
        ids, logits = [], []
        z_res = z
        z_hat = 0.0
        for l in range(self.num_codebooks):
            ids_, c, dist = self.match(z_res, books[l], l)
            q = straight_through(z_res, c)
            z_hat = z_hat + q
            loss = loss + _commit(c, z_res) + _commit(z_res, c) * self.commit_weight
            z_res = z_res - q
            ids.append(ids_)
            logits.append(-dist)
        return (
            z_hat,
            loss / self.num_codebooks,
            jnp.stack(ids, axis=-1),
            jnp.stack(logits, axis=1),
        )


class ResidualSimVQQuantizer(_QuantizerBase):
    """SimVQ: frozen random base codebooks + trainable linear
    projections (TIGER/quantizer.py:224-296)."""

    def setup(self):
        base_init = nn.initializers.normal(stddev=self.codebook_dim**-0.5)
        n = 1 if self.apply_shared_codebook else self.num_codebooks
        self._bases = [
            self.param(
                f"base_codebook_{i}", base_init,
                (self.num_codewords, self.codebook_dim),
            )
            for i in range(n)
        ]
        self._projs = [
            nn.Dense(self.codebook_dim, name=f"projection_{i}") for i in range(n)
        ]

    def _projected_books(self):
        books = [
            proj(jax.lax.stop_gradient(base))
            for proj, base in zip(self._projs, self._bases)
        ]
        if self.apply_shared_codebook:
            books = books * self.num_codebooks
        return books

    def embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        books = self._projected_books()
        return sum(books[l][ids[..., l]] for l in range(self.num_codebooks))

    def __call__(self, z: jnp.ndarray):
        books = self._projected_books()
        loss = 0.0
        ids = []
        z_res = z
        z_hat = 0.0
        for l in range(self.num_codebooks):
            ids_, c, _ = self.match(z_res, books[l], l)
            q = straight_through(z_res, c)
            z_hat = z_hat + q
            loss = loss + _commit(c, z_res) + _commit(z_res, c) * self.commit_weight
            z_res = z_res - q
            ids.append(ids_)
        return z_hat, loss / self.num_codebooks, jnp.stack(ids, axis=-1)

    def get_indices(self, z: jnp.ndarray) -> jnp.ndarray:
        books = self._projected_books()
        ids = []
        z_res = z
        for l in range(self.num_codebooks):
            ids_, c, _ = self.match(z_res, books[l], l)
            z_res = z_res - c
            ids.append(ids_)
        return jnp.stack(ids, axis=-1)


class ProductQuantizer(_QuantizerBase):
    """Product VQ over num_codebooks splits of the latent
    (TIGER/quantizer.py:299-321). Latent dim = codebooks * codebook_dim."""

    def __call__(self, z: jnp.ndarray):
        books = self._codebooks()
        z = z.reshape(z.shape[0], self.num_codebooks, self.codebook_dim)
        loss = 0.0
        ids, qs = [], []
        for l in range(self.num_codebooks):
            z_l = z[:, l, :]
            ids_, c, _ = self.match(z_l, books[l], l)
            loss = loss + _commit(c, z_l) + _commit(z_l, c) * self.commit_weight
            ids.append(ids_)
            qs.append(straight_through(z_l, c))
        z_hat = jnp.stack(qs, axis=1).reshape(z.shape[0], -1)
        return z_hat, loss / self.num_codebooks, jnp.stack(ids, axis=-1)

    def get_indices(self, z: jnp.ndarray) -> jnp.ndarray:
        books = self._codebooks()
        z = z.reshape(z.shape[0], self.num_codebooks, self.codebook_dim)
        ids = []
        for l in range(self.num_codebooks):
            ids_, _, _ = self.match(z[:, l, :], books[l], l)
            ids.append(ids_)
        return jnp.stack(ids, axis=-1)

    def embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        books = self._codebooks()
        parts = [books[l][ids[..., l]] for l in range(self.num_codebooks)]
        return jnp.concatenate(parts, axis=-1)


def _l2n(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    num = jnp.sum(a * b, axis=-1)
    den = jnp.maximum(
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), eps
    )
    return num / den


def preference_discrimination_loss(
    codebook: jnp.ndarray, temperature: float = 2.0
) -> jnp.ndarray:
    """Spread codewords over the unit sphere (R3-VAE/quantizer.py:161-167):
    log-mean of exp(-T * pairwise cosine distance) over off-diagonal pairs."""
    x = _l2n(codebook)
    sim = jnp.einsum("kd,md->km", x, x, preferred_element_type=jnp.float32)
    cos_dist = 1.0 - sim
    K = codebook.shape[0]
    off = ~jnp.eye(K, dtype=bool)
    vals = jnp.exp(-temperature * cos_dist)
    return jnp.log(jnp.sum(vals * off) / jnp.maximum(off.sum(), 1))


class RatingResidualQuantizer(nn.Module):
    """R3-VAE's reference-vector-guided residual rating quantizer
    (R3-VAE/quantizer.py:66-158): the normalized latent is decoupled into
    its projection onto a learnable reference vector plus a residual;
    each level picks the top-1 cosine codeword from a NORMALIZED codebook
    and adds it back scaled by its cosine score (the "rating") — fully
    differentiable through the score, no straight-through estimator.
    Returns (z_hat, sc_loss, pd_loss, ids): SC = per-level cosine cohesion
    of the cumulative reconstruction to the residual target; PD spreads
    each codebook over the sphere.

    TPU note: the per-level top-1 is one (B, K) matmul + argmax on the
    MXU; no gathers beyond the single (B,) codeword pick."""

    codebook_dim: int
    num_codebooks: int = 3
    num_codewords: int = 256
    pd_temperature: float = 2.0

    def setup(self):
        self.reference_vector = self.param(
            "reference_vector",
            lambda k, s: jax.random.uniform(k, s, minval=-1.0, maxval=1.0),
            (1, self.codebook_dim),
        )
        # torch init: U(-1/(l+1), 1/(l+1)) per level (quantizer.py:116-119);
        # k-means re-init happens host-side via post_init_params
        self._books = [
            self.param(
                f"codebook_{l}",
                (lambda bound: lambda k, s: jax.random.uniform(
                    k, s, minval=-bound, maxval=bound
                ))(1.0 / (l + 1)),
                (self.num_codewords, self.codebook_dim),
            )
            for l in range(self.num_codebooks)
        ]

    def decouple(self, z: jnp.ndarray):
        z = _l2n(z)
        ref = _l2n(self.reference_vector)
        values = jnp.sum(z * ref, axis=-1, keepdims=True)
        reference_out = values * ref
        return z - reference_out, reference_out

    def _match(self, z_res: jnp.ndarray, codebook: jnp.ndarray):
        cb = _l2n(codebook)
        r = _l2n(z_res)
        scores = jnp.einsum(
            "bd,kd->bk", r, cb, preferred_element_type=jnp.float32
        )
        w, idx = jax.lax.top_k(scores, 1)  # (B, 1) rating + index
        q = w * cb[idx[:, 0]]
        return idx[:, 0], q

    def __call__(self, z: jnp.ndarray):
        z_res, z_hat = self.decouple(z)
        target = z_res
        ids = []
        sc_loss = 0.0
        pd_loss = 0.0
        L = self.num_codebooks
        for l in range(L):
            ids_, q = self._match(z_res, self._books[l])
            z_hat = z_hat + q
            z_res = z_res - q
            ids.append(ids_)
            sc_loss = sc_loss + (1.0 - _cosine(target, z_hat).mean())
            pd_loss = pd_loss + preference_discrimination_loss(
                self._books[l], self.pd_temperature
            )
        return z_hat, sc_loss / L, pd_loss / L, jnp.stack(ids, axis=-1)

    def get_indices(self, z: jnp.ndarray) -> jnp.ndarray:
        z_res, _ = self.decouple(z)
        ids = []
        for l in range(self.num_codebooks):
            ids_, q = self._match(z_res, self._books[l])
            z_res = z_res - q
            ids.append(ids_)
        return jnp.stack(ids, axis=-1)
