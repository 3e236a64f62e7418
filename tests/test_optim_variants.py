"""Optimizer/scheduler variants and misc branch coverage."""
import jax
import jax.numpy as jnp
import numpy as np

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.train.state import make_optimizer


def _step_once(cfg):
    opt, sched = make_optimizer(cfg)
    params = {"w": jnp.ones((4, 4)), "embed": {"hash": jnp.ones((8, 2))}}
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    import optax
    new = optax.apply_updates(params, updates)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(new))
    return sched


def test_adam_default():
    cfg = default_config()
    sched = _step_once(cfg)
    assert float(sched(0)) == cfg.train.lr


def test_radam_and_sgd():
    for optim in ("radam", "sgd"):
        cfg = default_config().merged({"train": {"optim": optim}})
        _step_once(cfg)


def test_multistep_scheduler():
    cfg = default_config().merged({
        "train": {"scheduler": {"type": "multi_step",
                                "milestones": [2, 4], "gamma": 0.5}},
        "ep_iter": 10,
    })
    _, sched = make_optimizer(cfg)
    lr0 = float(sched(0))
    lr_after_m1 = float(sched(25))
    lr_after_m2 = float(sched(45))
    assert abs(lr_after_m1 - lr0 * 0.5) < 1e-9
    assert abs(lr_after_m2 - lr0 * 0.25) < 1e-9


def test_mlp_weight_decay_scaling():
    cfg = default_config().merged({"mlp_weight_decay": 0.5})
    _step_once(cfg)


def test_sample_pdf_det():
    from instant_nvr_tpu.ops.searchsorted import sample_pdf
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
    w = jnp.ones((2, 8))
    s = np.asarray(sample_pdf(jax.random.key(0), bins, w, 16, det=True))
    assert (np.diff(s, axis=-1) >= -1e-6).all()
    np.testing.assert_allclose(s[0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(s[0, -1], 1.0, atol=1e-5)


def test_config_hashable():
    cfg = default_config()
    assert isinstance(hash(cfg), int)
    d = {cfg: 1}
    assert d[default_config()] == 1


def test_moment_dtype_bf16():
    import jax.numpy as jnp
    from instant_nvr_tpu.config import default_config
    from instant_nvr_tpu.train.state import make_optimizer
    cfg = default_config().merged({"train": {"moment_dtype": "bfloat16"}})
    opt, _ = make_optimizer(cfg)
    params = {"w": jnp.ones((8, 4))}
    st = opt.init(params)
    import optax
    mu = optax.tree_utils.tree_get(st, "mu")
    assert mu["w"].dtype == jnp.bfloat16
    g = {"w": jnp.full((8, 4), 0.1)}
    upd, st = opt.update(g, st, params)
    assert jnp.isfinite(upd["w"]).all()


def test_warmup_multi_step_scheduler():
    """Matches the reference WarmupMultiStepLR semantics
    (lib/utils/optimizer/lr_scheduler.py:7-50) epoch for epoch."""
    from bisect import bisect_right

    base_lr, gamma, wf, wi = 0.01, 0.1, 1.0 / 3, 5
    milestones = [8, 12]
    cfg = default_config().merged({
        "train": {"lr": base_lr,
                  "scheduler": {"type": "warmup_multi_step",
                                "milestones": milestones, "gamma": gamma,
                                "warmup_factor": wf, "warmup_iters": wi,
                                "warmup_method": "linear"}},
        "ep_iter": 10,
    })
    _, sched = make_optimizer(cfg)

    def reference_lr(epoch):
        warm = 1.0
        if epoch < wi:
            alpha = epoch / wi
            warm = wf * (1 - alpha) + alpha
        return base_lr * warm * gamma ** bisect_right(milestones, epoch)

    for epoch in range(16):
        got = float(sched(epoch * 10))            # first step of the epoch
        assert abs(got - reference_lr(epoch)) < 1e-8, (epoch, got)

    # constant warmup branch
    cfg2 = cfg.merged({"train": {"scheduler": {"warmup_method": "constant"}}})
    _, sched2 = make_optimizer(cfg2)
    assert abs(float(sched2(0)) - base_lr * wf) < 1e-8
    assert abs(float(sched2(wi * 10)) - base_lr) < 1e-8
