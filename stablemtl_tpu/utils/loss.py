"""Training losses (jnp, jit-friendly) and loss weighting.

Parity with reference src/util/loss.py. All losses take an explicit
`valid_mask` instead of boolean indexing (dynamic shapes don't jit); masked
means are computed as sum(x*m)/sum(m), which equals the reference's
`loss(pred[mask], gt[mask]).mean()` for mean-reduction losses.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(x, mask):
    mask = mask.astype(x.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / denom


def mse_loss(pred, target, valid_mask=None):
    sq = (pred - target) ** 2
    if valid_mask is None:
        return sq.mean()
    return masked_mean(sq, valid_mask)


def l1_loss(pred, target, valid_mask=None):
    ab = jnp.abs(pred - target)
    if valid_mask is None:
        return ab.mean()
    return masked_mean(ab, valid_mask)


def l1_loss_with_mask(pred, target, valid_mask=None, batch_reduction=False):
    diff = pred - target
    if valid_mask is not None:
        diff = jnp.where(valid_mask, diff, 0.0)
        n = valid_mask.sum((-1, -2))
    else:
        n = target.shape[-2] * target.shape[-1]
    loss = jnp.abs(diff).sum() / n
    if batch_reduction:
        loss = loss.mean()
    return loss


def mean_abs_rel_loss(pred, target, valid_mask=None):
    # valid_mask accepted for the uniform get_loss(pred, target, mask)
    # calling convention; the reference MeanAbsRelLoss ignores masks too
    # (loss.py:106-113)
    return jnp.mean(jnp.abs((pred - target) / target), axis=0)


def silog_mse_loss(pred, target, valid_mask=None, lamb=0.5, log_pred=True,
                   batch_reduction=True):
    log_p = pred if log_pred else jnp.log(jnp.clip(pred, 1e-8))
    log_g = jnp.log(target)
    diff = log_p - log_g
    if valid_mask is not None:
        diff = jnp.where(valid_mask, diff, 0.0)
        n = valid_mask.sum((-1, -2))
    else:
        n = target.shape[-2] * target.shape[-1]
    first = (diff ** 2).sum((-1, -2)) / n
    second = lamb * diff.sum((-1, -2)) ** 2 / (n ** 2)
    loss = first - second
    if batch_reduction:
        loss = loss.mean()
    return loss


def silog_rmse_loss(pred, target, valid_mask=None, lamb=0.5, alpha=10.0,
                    log_pred=True):
    log_p = pred if log_pred else jnp.log(pred)
    log_g = jnp.log(target)
    diff = log_p - log_g
    if valid_mask is not None:
        diff = jnp.where(valid_mask, diff, 0.0)
        n = valid_mask.sum((-1, -2))
    else:
        n = target.shape[-2] * target.shape[-1]
    first = (diff ** 2).sum((-1, -2)) / n
    second = lamb * diff.sum((-1, -2)) ** 2 / (n ** 2)
    return jnp.sqrt(first - second).mean() * alpha


_LOSSES = {
    "mse_loss": mse_loss,
    "l1_loss": l1_loss,
    "l1_loss_with_mask": l1_loss_with_mask,
    "mean_abs_rel": mean_abs_rel_loss,
    "silog_mse": silog_mse_loss,
    "silog_rmse": silog_rmse_loss,
}


def get_loss(loss_name: str, **kwargs):
    """Returns loss_fn(pred, target, valid_mask) closing over extra kwargs."""
    if loss_name not in _LOSSES:
        raise NotImplementedError(loss_name)
    fn = _LOSSES[loss_name]
    kwargs = {k: v for k, v in kwargs.items() if k != "reduction"}

    def wrapped(pred, target, valid_mask=None):
        return fn(pred, target, valid_mask=valid_mask, **kwargs)

    return wrapped


class MovingAverageLossWeighter:
    """EMA-magnitude loss balancer (host-side; parity with loss.py:4-67).

    Constructed by the reference trainer but its weights are not applied to
    the training loss; kept for API completeness.
    """

    def __init__(self, loss_names, min_weight=0.2, max_weight=5.0,
                 alpha=0.98, epsilon=1e-8):
        self.alpha = alpha
        self.epsilon = epsilon
        self.min_weight = min_weight
        self.max_weight = max_weight
        self.ema = {n: 1.0 for n in loss_names}
        self.first = {n: True for n in loss_names}

    def __call__(self, loss_dict):
        for name, val in loss_dict.items():
            v = float(val)
            if self.first[name]:
                self.ema[name] = v
                self.first[name] = False
            else:
                self.ema[name] = self.alpha * self.ema[name] + (1 - self.alpha) * v
        if any(self.first.values()):
            return {n: 1.0 for n in loss_dict}
        avg = sum(self.ema[n] for n in self.ema) / len(self.ema)
        out = {}
        for n in loss_dict:
            w = avg / max(self.ema[n], self.epsilon)
            out[n] = min(max(w, self.min_weight), self.max_weight)
        return out
