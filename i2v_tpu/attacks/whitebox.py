"""White-box attacks against video recognition models.

Reference parity (class names keep the reference's spelling so CLI dispatch
``getattr(attacks, method)`` works unchanged, attack.py:76-83):

  FGSM / BIM / MIFGSM           base_attacks.py:236-340
  DIFGSM                        base_attacks.py:342-411
  TIFGSM / TIFGSM3D             base_attacks.py:413-479, 612-683
  SGM                           base_attacks.py:481-551
  SIM                           base_attacks.py:553-610
  TAP                           base_attacks.py:685-814

Every attack is the scan engine from :mod:`i2v_tpu.attacks.core` with a
specific (grad_fn, smooth_fn, normalization, momentum) configuration; jitted
once per input shape and cached.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.api import VideoModel, rebind_params
from ..ops import diversity, grads as grad_ops, losses, pixel, smoothing
from .core import Attack, SignAttackConfig, make_ce_grad_fn, run_sign_attack

EPS_DEFAULT = 16 / 255


class _SignEngineAttack(Attack):
    """Shared machinery: per-shape jit cache around run_sign_attack.

    Model params are passed as runtime jit ARGUMENTS (not closure captures):
    captured arrays become HLO constants, bloating the program with the full
    weight set — slow compiles and, on tunneled devices, upload-size limits.
    """

    def __init__(self, name: str, model: VideoModel, cfg: SignAttackConfig):
        super().__init__(name, model)
        self.cfg = cfg
        self.epsilon = cfg.epsilon
        self.steps = cfg.steps
        self.step_size = cfg.alpha
        self._jit_cache: dict = {}

    def _build_grad_fn(self, bundle):
        return make_ce_grad_fn(bundle.apply_norm, self._targeted)

    def _build_smooth_fn(self):
        return None

    def jitted_runner(self, shape, dtype="float32"):
        """The per-shape jitted scan program ``(params, clean01, labels, rng)
        -> (adv01, costs)`` — exposed so tools/perf_probe.py can AOT-lower it
        for HBM/cost analysis without executing an attack."""
        key = (tuple(shape), str(dtype), self._targeted)
        if key not in self._jit_cache:
            smooth_fn = self._build_smooth_fn()
            cfg = self.cfg

            def runner(params, c, l, r):
                bundle = rebind_params(self.model, params)
                grad_fn = self._build_grad_fn(bundle)
                return run_sign_attack(grad_fn, c, l, cfg, smooth_fn=smooth_fn, rng=r)

            self._jit_cache[key] = jax.jit(runner)
        return self._jit_cache[key]

    def _attack01(self, clean01, labels, rng):
        jitted = self.jitted_runner(clean01.shape, clean01.dtype)
        return jitted(self.model.params, clean01, labels, rng)


class FGSM(_SignEngineAttack):
    """One-step sign attack: adv = clean + ε·sign(∇CE), clipped to [0,1]
    (reference: base_attacks.py:236-259)."""

    def __init__(self, model: VideoModel, steps=None, epsilon=EPS_DEFAULT):
        del steps  # reference accepts-and-ignores it too
        cfg = SignAttackConfig(epsilon=epsilon, steps=1, step_size=epsilon)
        super().__init__("FGSM", model, cfg)


class BIM(_SignEngineAttack):
    """Iterative FGSM with per-step ε-projection (reference:
    base_attacks.py:261-295). step_size = ε/steps."""

    def __init__(self, model: VideoModel, epsilon=EPS_DEFAULT, steps=10):
        super().__init__("BIM", model, SignAttackConfig(epsilon=epsilon, steps=steps))


class MIFGSM(_SignEngineAttack):
    """Momentum iterative FGSM with frame-level L1-mean gradient
    normalization (reference: base_attacks.py:297-340)."""

    def __init__(self, model: VideoModel, epsilon=EPS_DEFAULT, steps=10, decay=1.0):
        cfg = SignAttackConfig(
            epsilon=epsilon, steps=steps, use_momentum=True, decay=decay,
            grad_norm="frame",
        )
        super().__init__("MIFGSM", model, cfg)


class DIFGSM(_SignEngineAttack):
    """Diverse-inputs FGSM: random resize/pad of the normalized input with
    p=0.5 each step (reference: base_attacks.py:342-411); optional momentum
    with whole-tensor L1 normalization."""

    def __init__(self, model: VideoModel, epsilon=EPS_DEFAULT, steps=10,
                 decay=1.0, momentum=False):
        cfg = SignAttackConfig(
            epsilon=epsilon, steps=steps, use_momentum=momentum, decay=decay,
            grad_norm="l1" if momentum else None,
        )
        super().__init__("DIFGSM", model, cfg)

    def _build_grad_fn(self, bundle):
        apply_norm = bundle.apply_norm
        targeted = self._targeted

        def cost_fn(x_norm, labels, rng):
            y = diversity.input_diversity(x_norm, rng)
            return targeted * losses.cross_entropy(apply_norm(y), labels)

        vg = jax.value_and_grad(cost_fn)

        def grad_fn(adv01, labels, rng):
            return vg(pixel.normalize(adv01, channel_axis=1), labels, rng)

        return grad_fn


class TIFGSM(_SignEngineAttack):
    """Translation-invariant FGSM: 15×15 Gaussian depthwise smoothing of the
    gradient per frame (reference: base_attacks.py:413-479)."""

    def __init__(self, model: VideoModel, epsilon=EPS_DEFAULT, steps=10,
                 decay=1.0, momentum=False, kernlen=15, nsig=3.0):
        cfg = SignAttackConfig(
            epsilon=epsilon, steps=steps, use_momentum=momentum, decay=decay,
        )
        super().__init__("TIFGSM", model, cfg)
        # the 15×15 kernel is outer(k1,k1): two banded matmuls instead of a
        # 3-channel depthwise conv (see ti_smooth_2d_separable)
        self._k1d = smoothing.gaussian_1d(kernlen, nsig)

    def _build_smooth_fn(self):
        k1d = self._k1d
        return lambda g: smoothing.ti_smooth_2d_separable(g, k1d)


class TIFGSM3D(_SignEngineAttack):
    """3-D translation-invariant FGSM: separable 15³ Gaussian over (T,H,W)
    then frame-level normalization (reference: base_attacks.py:612-683)."""

    def __init__(self, model: VideoModel, epsilon=EPS_DEFAULT, steps=10,
                 decay=1.0, momentum=False, kernlen=15, nsig=3.0):
        cfg = SignAttackConfig(
            epsilon=epsilon, steps=steps, use_momentum=momentum, decay=decay,
        )
        super().__init__("TIFGSM3D", model, cfg)
        # the 15³ kernel is an exact outer product (base_attacks.py:627-633):
        # smooth with three banded matmuls instead of a depthwise conv3d
        # whose 3-channel groups can't tile onto the MXU (~10× slower)
        self._k1d = smoothing.gaussian_1d(kernlen, nsig)

    def _build_smooth_fn(self):
        k1d = self._k1d

        def smooth(g):
            return grad_ops.norm_grads(
                smoothing.depthwise_conv3d_separable(g, k1d), True)

        return smooth


class SGM(_SignEngineAttack):
    """Skip Gradient Method: γ^0.5-scaled ReLU gradients via custom-VJP
    activations instead of backward hooks (reference: base_attacks.py:481-551).
    The model bundle must support ``with_relu_grad_scale``."""

    def __init__(self, model: VideoModel, epsilon=EPS_DEFAULT, steps=10,
                 decay=1.0, gamma=0.5, momentum=False):
        scaled = model.with_relu_grad_scale(float(np.power(gamma, 0.5)))
        cfg = SignAttackConfig(
            epsilon=epsilon, steps=steps, use_momentum=momentum, decay=decay,
            grad_norm="l1" if momentum else None,
        )
        super().__init__("SGM", scaled, cfg)
        self.gamma = gamma


class SIM(_SignEngineAttack):
    """Scale-invariant method: gradients averaged over inputs scaled by
    1/2^i, i < scale_steps, each taken w.r.t. the scaled normalized tensor
    (reference: base_attacks.py:553-610)."""

    def __init__(self, model: VideoModel, epsilon=EPS_DEFAULT, steps=10,
                 decay=1.0, scale_steps=5, momentum=False,
                 batch_scales=False):
        cfg = SignAttackConfig(
            epsilon=epsilon, steps=steps, use_momentum=momentum, decay=decay,
            grad_norm="l1" if momentum else None,
        )
        super().__init__("SIM", model, cfg)
        self.scale_steps = scale_steps
        # batch_scales: fold the scale copies into the batch axis — ONE
        # fwd+bwd of n·B clips instead of a length-n scan (same math: the
        # stacked mean-CE's gradient is exactly the mean of per-scale
        # gradients). n× activation memory; a throughput win when it fits.
        self.batch_scales = batch_scales

    def _build_grad_fn(self, bundle):
        apply_norm = bundle.apply_norm
        targeted = self._targeted
        n = self.scale_steps

        if self.batch_scales:
            # NOTE the reference differentiates w.r.t. each SCALED tensor
            # (base_attacks.py:569-577), with no 1/2^i chain factor back to
            # the input — so differentiate w.r.t. the stacked copies and sum
            # over the scale axis, not w.r.t. x_norm.
            def grad_fn(adv01, labels, rng):
                x_norm = pixel.normalize(adv01, channel_axis=1)
                b = x_norm.shape[0]
                stacked = jnp.concatenate(
                    [x_norm / (2.0**i) for i in range(n)], axis=0)

                def cost_all(s):
                    return targeted * losses.cross_entropy(
                        apply_norm(s), jnp.tile(labels, n))

                cost, gs = jax.value_and_grad(cost_all)(stacked)
                g = gs.reshape((n, b) + x_norm.shape[1:]).sum(0)
                return cost, g

            return grad_fn

        def cost_fn(y, labels):
            return targeted * losses.cross_entropy(apply_norm(y), labels)

        vg = jax.value_and_grad(cost_fn)

        def grad_fn(adv01, labels, rng):
            x_norm = pixel.normalize(adv01, channel_axis=1)

            def body(acc, i):
                scale = 1.0 / (2.0**i)
                c, g = vg(scale * x_norm, labels)
                return (acc[0] + c, acc[1] + g), None

            (cost, gsum), _ = jax.lax.scan(
                body, (0.0, jnp.zeros_like(x_norm)), jnp.arange(n, dtype=jnp.float32)
            )
            return cost / n, gsum / n

        return grad_fn


class TAP(Attack):
    """Transferable Adversarial Perturbations: CE + 0.05·Σ signed-√ feature
    distance over early video-model taps + η·L1 of the kernel-smoothed
    perturbation (reference: base_attacks.py:685-814).

    The model bundle's ``tap_keys`` select the per-architecture target layers
    (i3d res_layers 0-1 / slowfast slow,fast res2-3 / tpn layer1-2,
    base_attacks.py:737-743). The reference's ``cost2`` is a per-sample
    vector; its scalarization (implicit at batch 1) is an explicit sum here.
    ``eta`` is the smoothness weight (the reference hard-codes 1e3 at
    base_attacks.py:801 regardless of its params dict).
    """

    def __init__(self, model: VideoModel, params: Optional[dict] = None,
                 epsilon=EPS_DEFAULT, steps=10):
        super().__init__("TAP", model)
        p = dict(kernlen=3, temporal_kernlen=3, eta=1e3, conv3d=True,
                 feat_coef=0.05)
        p.update(params or {})
        self.epsilon = epsilon
        self.steps = steps
        self.step_size = epsilon / steps
        self.kernlen = int(p["kernlen"])
        self.temporal_kernlen = int(p["temporal_kernlen"])
        self.eta = float(p["eta"])
        self.conv3d = bool(p["conv3d"])
        self.feat_coef = float(p["feat_coef"])
        if self.conv3d:
            self._kernel = smoothing.uniform_kernel_3d(self.kernlen, self.temporal_kernlen)
        else:
            self._kernel = smoothing.uniform_kernel_2d(self.kernlen)
        self._jit_cache: dict = {}

    def _attack01(self, clean01, labels, rng):
        key = (clean01.shape, self._targeted)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._build_runner())
        return self._jit_cache[key](self.model.params, clean01, labels, rng)

    def _build_runner(self):
        targeted = self._targeted
        kernel = self._kernel
        conv3d = self.conv3d
        eta, feat_coef = self.eta, self.feat_coef
        cfg = SignAttackConfig(epsilon=self.epsilon, steps=self.steps,
                               step_size=self.step_size)

        def runner(params, clean01, labels, rng):
            model = rebind_params(self.model, params)
            x_norm_clean = pixel.normalize(clean01, channel_axis=1)
            _, clean_taps = model.apply_norm_taps(x_norm_clean)
            clean_taps = [jax.lax.stop_gradient(t) for t in clean_taps]
            batch = clean01.shape[0]

            def cost_fn(x_norm, labels):
                logits, taps = model.apply_norm_taps(x_norm)
                ce = targeted * losses.cross_entropy(logits, labels)
                dist = jnp.sum(losses.tap_feature_distance(taps, clean_taps, batch))
                # perturbation in the reference's _transform_perts scale:
                # (adv_norm − clean_norm)/std = Δ01/std² (base_attacks.py:795)
                perts = pixel.scale_perts(x_norm - x_norm_clean, channel_axis=1)
                if conv3d:
                    sm = smoothing.depthwise_conv3d(perts, kernel)
                else:
                    sm = smoothing.depthwise_conv2d_frames(perts, kernel)
                reg = jnp.sum(jnp.abs(sm))
                return ce + eta * reg + feat_coef * dist, (ce, reg, dist)

            vg = jax.value_and_grad(cost_fn, has_aux=True)

            def grad_fn(adv01, labels, rng):
                (cost, aux), g = vg(pixel.normalize(adv01, channel_axis=1), labels)
                return jnp.stack([cost, *aux]), g

            return run_sign_attack(grad_fn, clean01, labels, cfg, rng=rng)

        return runner

    def _record_costs(self, costs, video_names) -> None:
        # base-class contract (Attack._record_costs): per-video keys and
        # JSON-serializable string values — loss_info feeds json.dump via
        # artifacts.save_loss_info, and index keys would make each batch
        # overwrite the previous one's records
        if video_names is None or costs is None:
            return
        costs = np.asarray(costs)  # (steps, 4): total, ce, reg, dist
        for name in video_names:
            per_video = self.loss_info.setdefault(str(name), {})
            for i in range(costs.shape[0]):
                per_video[i] = {
                    "cost": str(np.float32(costs[i, 0])),
                    "ce loss": str(np.float32(costs[i, 1])),
                    "reg_cost": str(np.float32(costs[i, 2])),
                    "distance": str(np.float32(costs[i, 3])),
                }
