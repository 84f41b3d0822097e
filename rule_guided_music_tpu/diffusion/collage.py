"""DiffCollage: long-form score stitching via conditional-independence
epsilon composition.

Re-architecture of diff_collage/{w_img.py, condind_long.py, condind_circle.py}:
the reference's F.unfold/F.fold become static window slicing + scatter-add,
and the per-window denoiser calls batch into one (B*n) forward — a pure
function the scan-based sampler treats as just another ``model_fn``.

State layout matches the reference sampler contract: the long latent is
(B, C, T_long, P) with time on axis -2 (dc_model_fn permutes to the
worker's (C, P, time) view internally; here we fold that permute into the
window math and call the base model directly on (B*n, C, base, P)).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

BASE_LEN = 128  # window length in latent columns (w_img.py:12)


def linear_length(num_img: int, overlap: int, base: int = BASE_LEN) -> int:
    return base * num_img - overlap * (num_img - 1)


def circle_length(num_img: int, overlap: int, base: int = BASE_LEN) -> int:
    # circle uses num_img + 1 windows over a wrapped image (condind_circle.py:8-15)
    n = num_img + 1
    return base * n - overlap * n


def split_windows(x: jnp.ndarray, n: int, base: int = BASE_LEN) -> jnp.ndarray:
    """(B, C, T_long, P) -> (B*n, C, base, P), window index fastest."""
    b, c, t_long, p = x.shape
    overlap = (n * base - t_long) // (n - 1)
    assert n * base - overlap * (n - 1) == t_long, (n, base, overlap, t_long)
    stride = base - overlap
    wins = jnp.stack([x[:, :, i * stride:i * stride + base, :] for i in range(n)],
                     axis=1)
    return wins.reshape(b * n, c, base, p), overlap


def merge_windows(
    wins: jnp.ndarray, overlap: int, n: int, is_avg: bool = True
) -> jnp.ndarray:
    """(B*n, C, base, P) -> (B, C, T_long, P) by scatter-add (optionally
    normalized by overlap counts), mirroring avg_merge_wimg."""
    bn, c, base, p = wins.shape
    b = bn // n
    t_long = n * base - (n - 1) * overlap
    stride = base - overlap
    wins = wins.reshape(b, n, c, base, p)
    out = jnp.zeros((b, c, t_long, p), dtype=wins.dtype)
    count = jnp.zeros((1, 1, t_long, 1), dtype=wins.dtype)
    for i in range(n):
        sl = slice(i * stride, i * stride + base)
        out = out.at[:, :, sl, :].add(wins[:, i])
        count = count.at[:, :, sl, :].add(1.0)
    return out / count if is_avg else out


def make_cond_ind_eps_fn(
    eps_fn: Callable,
    num_img: int,
    overlap: int,
    circle: bool = False,
    base: int = BASE_LEN,
) -> Callable:
    """Build the stitched long-score epsilon closure.

    ``eps_fn(x, t, y)`` is the per-window denoiser on (N, C, base, P)
    latents (time on axis -2). Returns a closure with the same signature on
    (B, C, T_long, P). Linear chain: condind_long.py:24-51; circular:
    condind_circle.py:41-84.
    """
    n = num_img + 1 if circle else num_img

    def long_eps(x: jnp.ndarray, t: jnp.ndarray, y=None) -> jnp.ndarray:
        if circle:
            x_ext = jnp.concatenate([x, x[:, :, :overlap, :]], axis=2)
        else:
            x_ext = x
        b = x.shape[0]
        wins, ov = split_windows(x_ext, n, base)
        assert ov == overlap, (ov, overlap)
        t_rep = jnp.repeat(t, n, axis=0)
        y_rep = jnp.repeat(y, n, axis=0) if y is not None else None

        full_eps = eps_fn(wins, t_rep, y_rep)                # (B*n, C, base, P)
        half_eps = eps_fn(wins[:, :, -overlap:, :], t_rep, y_rep)
        half_eps = half_eps.reshape(b, n, *half_eps.shape[1:])
        # last window's trailing overlap has no successor factor
        half_eps = half_eps.at[:, -1].set(0.0)
        full_eps = full_eps.reshape(b, n, *full_eps.shape[1:])
        full_eps = full_eps.at[:, :, :, -overlap:, :].add(
            -half_eps
        )
        merged = merge_windows(
            full_eps.reshape(b * n, *full_eps.shape[2:]), overlap, n,
            is_avg=False,
        )
        if circle:
            head = (merged[:, :, :overlap, :] + merged[:, :, -overlap:, :]) / 2.0
            return jnp.concatenate([head, merged[:, :, overlap:-overlap, :]],
                                   axis=2)
        return merged

    return long_eps


def make_avg_eps_fn(
    eps_fn: Callable,
    num_img: int,
    overlap: int,
    circle: bool = False,
    base: int = BASE_LEN,
) -> Callable:
    """Naive averaging baseline (diff_collage/avg_long.py:7-40, avg_circle.py):
    per-window epsilons merged by plain overlap averaging, without the
    conditional-independence correction."""
    n = num_img + 1 if circle else num_img

    def long_eps(x: jnp.ndarray, t: jnp.ndarray, y=None) -> jnp.ndarray:
        x_ext = (jnp.concatenate([x, x[:, :, :overlap, :]], axis=2)
                 if circle else x)
        b = x.shape[0]
        wins, ov = split_windows(x_ext, n, base)
        t_rep = jnp.repeat(t, n, axis=0)
        y_rep = jnp.repeat(y, n, axis=0) if y is not None else None
        eps = eps_fn(wins, t_rep, y_rep)
        merged = merge_windows(eps, overlap, n, is_avg=True)
        if circle:
            head = (merged[:, :, :overlap, :] + merged[:, :, -overlap:, :]) / 2.0
            return jnp.concatenate([head, merged[:, :, overlap:-overlap, :]],
                                   axis=2)
        return merged

    return long_eps


def make_loss_guided_eps_fn(
    eps_fn: Callable,
    num_img: int,
    overlap: int,
    weight: float = 1.0,
) -> Callable:
    """Loss-guided stitching worker (diff_collage/w_loss.py:40-120,
    SeqWorker essence).

    Unlike the factor-graph composition, this worker diffuses num_img
    INDEPENDENT window states simultaneously — state shape
    ``(B, num_img, C, base, P)`` — and corrects each window's epsilon by the
    gradient of the overlap-consistency loss
    ``sum ||x̂0[i][-ov:] - x̂0[i+1][:ov]||²`` so adjacent windows converge to
    agreement during sampling.  Sigma space: x̂0 = x - sigma * eps; the final
    long score is assembled with ``merge_windows`` on the x̂0 stack.
    """

    def stacked_eps(x: jnp.ndarray, sigma: jnp.ndarray, y=None) -> jnp.ndarray:
        b, n, c, base_len, p = x.shape
        assert n == num_img, (n, num_img)
        flat = x.reshape(b * n, c, base_len, p)
        sig_rep = jnp.repeat(sigma, n, axis=0)
        y_rep = jnp.repeat(y, n, axis=0) if y is not None else None
        eps = eps_fn(flat, sig_rep, y_rep)
        sig_b = sig_rep.reshape((-1,) + (1,) * (flat.ndim - 1))
        x0 = flat - sig_b * eps

        def overlap_loss(x_in):
            eps_in = eps_fn(x_in, sig_rep, y_rep)
            x0w = (x_in - sig_b * eps_in).reshape(b, n, c, base_len, p)
            left = x0w[:, :-1, :, -overlap:, :]
            right = x0w[:, 1:, :, :overlap, :]
            return jnp.sum((left - right) ** 2)

        grad = jax.grad(overlap_loss)(flat)
        eps = eps + weight * sig_b * grad
        return eps.reshape(b, n, c, base_len, p)

    return stacked_eps


def make_cond_ind_sr_eps_fn(
    eps_fn: Callable,
    num_img: int,
    overlap: int,
    low_res: jnp.ndarray,
    circle: bool = False,
    base: int = BASE_LEN,
) -> Callable:
    """Super-resolution stitching (diff_collage/condind_long.py:56-120
    CondIndSR / condind_circle.py CondIndCircleSR): the per-window denoiser
    is conditioned on the matching window of a low-resolution score.

    ``eps_fn(x, t, y, low)`` is a SuperRes-style denoiser;
    ``low_res``: (B, C, T_low, P_low) with T_low proportional to T_long.
    """
    n = num_img + 1 if circle else num_img
    t_low = low_res.shape[2]

    def long_eps(x: jnp.ndarray, t: jnp.ndarray, y=None) -> jnp.ndarray:
        b = x.shape[0]
        if circle:
            x_ext = jnp.concatenate([x, x[:, :, :overlap, :]], axis=2)
        else:
            x_ext = x
        t_long = x_ext.shape[2]
        low_base = base * t_low // (x.shape[2] + (overlap if circle else 0))
        low_overlap = overlap * low_base // base
        if circle:
            low_ext = jnp.concatenate(
                [low_res, low_res[:, :, :low_overlap, :]], axis=2
            )
        else:
            low_ext = low_res
        wins, ov = split_windows(x_ext, n, base)
        low_wins, _ = split_windows(low_ext, n, low_base)
        t_rep = jnp.repeat(t, n, axis=0)
        y_rep = jnp.repeat(y, n, axis=0) if y is not None else None

        full_eps = eps_fn(wins, t_rep, y_rep, low_wins)
        half_eps = eps_fn(
            wins[:, :, -overlap:, :], t_rep, y_rep,
            low_wins[:, :, -low_overlap:, :],
        )
        half_eps = half_eps.reshape(b, n, *half_eps.shape[1:])
        half_eps = half_eps.at[:, -1].set(0.0)
        full_eps = full_eps.reshape(b, n, *full_eps.shape[1:])
        full_eps = full_eps.at[:, :, :, -overlap:, :].add(-half_eps)
        merged = merge_windows(
            full_eps.reshape(b * n, *full_eps.shape[2:]), overlap, n,
            is_avg=False,
        )
        if circle:
            head = (merged[:, :, :overlap, :] + merged[:, :, -overlap:, :]) / 2.0
            return jnp.concatenate([head, merged[:, :, overlap:-overlap, :]],
                                   axis=2)
        return merged

    return long_eps


# ---------------------------------------------------------------------------
# Legacy EDM loss-guided worker zoo (diff_collage/w_loss.py:94-432)
# ---------------------------------------------------------------------------
# These pair with diffusion/edm.py's sigma-space Heun sampler: each wraps a
# sigma-parameterized ``eps_fn(x, sigma, y)`` and corrects epsilon by the
# gradient of a consistency loss on x̂0 = x - sigma*eps, with the reference's
# closed-form "optimal" least-squares step weight
# (argmin_w ||delta_pixel - w * delta_grad||², w_loss.py:111-125,179-190).


def _optimal_weight(delta_pixel: jnp.ndarray, delta_grad: jnp.ndarray,
                    eps: float = 1e-12) -> jnp.ndarray:
    num = jnp.sum(delta_pixel * delta_grad)
    den = jnp.sum(delta_grad * delta_grad)
    return num / (den + eps)


def make_seq_extend_eps_fn(
    eps_fn: Callable,
    src_img: jnp.ndarray,
    overlap: int,
    weight: float | str = "optimal",
    ratio: float = 1.0,
) -> Callable:
    """SeqWorker (w_loss.py:94-125): continue a FIXED source excerpt.

    The sampled window's head must match the source's tail:
    loss = ||src[..., -ov:] - x̂0[..., :ov, :]||² over the latent-time axis;
    epsilon is corrected by its gradient with the closed-form optimal (or a
    fixed) weight.  ``src_img``: (B, C, T_src, P).
    """
    src_tail = src_img[:, :, -overlap:, :]

    def guided_eps(x: jnp.ndarray, sigma: jnp.ndarray, y=None) -> jnp.ndarray:
        sig_b = sigma.reshape((-1,) + (1,) * (x.ndim - 1))

        def x0_of(x_in):
            return x_in - sig_b * eps_fn(x_in, sigma, y)

        def loss(x_in):
            x0 = x0_of(x_in)
            return jnp.sum((src_tail - x0[:, :, :overlap, :]) ** 2)

        grad = jax.grad(loss)(x)
        if weight == "optimal":
            x0 = x0_of(x)
            delta_pixel = x0[:, :, :overlap, :] - src_tail
            w = _optimal_weight(delta_pixel, grad[:, :, :overlap, :]) * ratio
        else:
            w = jnp.asarray(weight, dtype=x.dtype)
        # x0_cor = x0 - w*grad (w_loss.py:59)  <=>  eps + (w/sigma)*grad
        return eps_fn(x, sigma, y) + w * grad / jnp.maximum(sig_b, 1e-8)

    return guided_eps


def seq_x0_replace(x0: jnp.ndarray, src_img: jnp.ndarray,
                   overlap: int) -> jnp.ndarray:
    """SeqWorker.x0_replace (w_loss.py:106-109): pin the head to the source
    tail (hard replacement variant of the soft gradient correction)."""
    return x0.at[:, :, :overlap, :].set(src_img[:, :, -overlap:, :])


def make_circle_loss_eps_fn(
    eps_fn: Callable,
    overlap: int,
    weight: float | str = "optimal",
) -> Callable:
    """CircleWorker (w_loss.py:127-190): the BATCH is a ring of windows —
    window i's head must match window i-1's tail (roll along batch), so the
    batch closes into one circular long score.
    """

    def match_patch(a: jnp.ndarray):
        tail = jnp.roll(a[:, :, -overlap:, :], 1, axis=0)
        head = a[:, :, :overlap, :]
        return tail, head

    def guided_eps(x: jnp.ndarray, sigma: jnp.ndarray, y=None) -> jnp.ndarray:
        sig_b = sigma.reshape((-1,) + (1,) * (x.ndim - 1))

        def x0_of(x_in):
            return x_in - sig_b * eps_fn(x_in, sigma, y)

        def loss(x_in):
            tail, head = match_patch(x0_of(x_in))
            return jnp.sum((tail - head) ** 2)

        grad = jax.grad(loss)(x)
        if weight == "optimal":
            tail, head = match_patch(x0_of(x))
            g_tail, g_head = match_patch(grad)
            w = _optimal_weight(tail - head, g_tail - g_head)
        else:
            w = jnp.asarray(weight, dtype=x.dtype)
        # x0_cor = x0 - w*grad (w_loss.py:59)  <=>  eps + (w/sigma)*grad
        return eps_fn(x, sigma, y) + w * grad / jnp.maximum(sig_b, 1e-8)

    return guided_eps


def circle_merge_batch(x: jnp.ndarray, overlap: int) -> jnp.ndarray:
    """CircleWorker.merge_circle_image (w_loss.py:155-163): fold a ring
    batch (B windows) into one circular long image, averaging the seam."""
    b = x.shape[0]
    merged = merge_windows(x, overlap, b, is_avg=True)
    head = (merged[:, :, :overlap, :] + merged[:, :, -overlap:, :]) / 2.0
    return jnp.concatenate([head, merged[:, :, overlap:-overlap, :]], axis=2)


def make_para_loss_eps_fn(
    eps_fn: Callable,
    overlap: int,
    weight: float | str = "optimal",
) -> Callable:
    """ParaWorker (w_loss.py:226+): linear-chain variant of the batch-ring —
    window i's head matches window i-1's tail with NO wraparound (the first
    window is unconstrained), closing the batch into one linear long score.
    """

    def match_patch(a: jnp.ndarray):
        tail = a[:-1, :, -overlap:, :]
        head = a[1:, :, :overlap, :]
        return tail, head

    def guided_eps(x: jnp.ndarray, sigma: jnp.ndarray, y=None) -> jnp.ndarray:
        sig_b = sigma.reshape((-1,) + (1,) * (x.ndim - 1))

        def x0_of(x_in):
            return x_in - sig_b * eps_fn(x_in, sigma, y)

        def loss(x_in):
            tail, head = match_patch(x0_of(x_in))
            return jnp.sum((tail - head) ** 2)

        grad = jax.grad(loss)(x)
        if weight == "optimal":
            tail, head = match_patch(x0_of(x))
            g_tail, g_head = match_patch(grad)
            w = _optimal_weight(tail - head, g_tail - g_head)
        else:
            w = jnp.asarray(weight, dtype=x.dtype)
        # x0_cor = x0 - w*grad (w_loss.py:59)  <=>  eps + (w/sigma)*grad
        return eps_fn(x, sigma, y) + w * grad / jnp.maximum(sig_b, 1e-8)

    return guided_eps
