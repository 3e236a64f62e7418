"""Stages, LR schedule, recorder, loss weights, freq embedder."""
import numpy as np
import jax.numpy as jnp

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.models.embedders import freq_encode, freq_out_dim
from instant_nvr_tpu.train.recorder import Recorder, SmoothedValue
from instant_nvr_tpu.train.stages import stage_for_epoch
from instant_nvr_tpu.train.state import make_lr_schedule
from instant_nvr_tpu.train.step import make_loss_weights


def test_stage_schedule_matches_reference_semantics():
    cfg = default_config().merged({
        "ratio": 0.5,
        "training_stages": [
            {"ratio": 0.3, "_start": 0},
            {"ratio": 0.5, "sample_focus": "head", "_start": 2},
            {"ratio": 0.5, "sample_focus": "", "reg_dist_weight": 1.0, "_start": 4},
        ],
    })
    assert stage_for_epoch(cfg, 0).ratio == 0.3
    assert stage_for_epoch(cfg, 1).ratio == 0.3
    s2 = stage_for_epoch(cfg, 2)
    assert s2.ratio == 0.5 and s2.sample_focus == "head"
    s4 = stage_for_epoch(cfg, 5)
    assert s4.sample_focus == "" and s4.reg_dist_weight == 1.0
    # cfg itself untouched (no global mutation)
    assert cfg.ratio == 0.5


def test_exponential_lr_schedule():
    # reference: lr * gamma**(epoch/decay_epochs), stepped per epoch
    sched = make_lr_schedule(5e-4, gamma=0.1, decay_epochs=1000, ep_iter=500)
    np.testing.assert_allclose(float(sched(0)), 5e-4)
    np.testing.assert_allclose(float(sched(499)), 5e-4)          # same epoch
    np.testing.assert_allclose(float(sched(500)), 5e-4 * 0.1 ** (1 / 1000))
    np.testing.assert_allclose(float(sched(2999)), 5e-4 * 0.1 ** (5 / 1000))


def test_smoothed_value():
    sv = SmoothedValue(window=3)
    for v in [1, 2, 3, 100]:
        sv.update(v)
    assert sv.median == 3  # median of last 3: [2, 3, 100]
    assert sv.global_avg == 106 / 4


def test_recorder_disabled_noop(tmp_path):
    r = Recorder(str(tmp_path / "rec"), enabled=False)
    r.update({"loss": 1.0})
    r.record()
    assert r.state_dict() == {"step": 0, "epoch": 0}


def test_loss_weights_from_cfg():
    cfg = default_config().merged({"use_lpips": True, "pair_loss_weight": 10.0})
    lw = make_loss_weights(cfg)
    assert lw.use_patch and lw.patch_kind == "lpips"
    assert lw.pair == 10.0
    cfg2 = default_config()
    assert not make_loss_weights(cfg2).use_patch


def test_freq_encode_reference_semantics():
    # out_dim = D + multires*2*D; layout [x, sin(2^i x)..., cos(2^i x)...]
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = np.asarray(freq_encode(x, multires=4))
    assert out.shape == (1, freq_out_dim(4, 3)) == (1, 27)
    np.testing.assert_allclose(out[0, :3], [0.5, -0.25, 1.0], atol=1e-6)
    # level 0 sin block
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
    # level 3 (freq 8) blocks
    np.testing.assert_allclose(out[0, 21:24], np.sin(8 * np.array([0.5, -0.25, 1.0])),
                               atol=1e-5)


def test_remat_step_matches_plain():
    """remat=True recomputes the forward in backward — numerically identical."""
    import jax
    import jax.numpy as jnp
    import optax
    from instant_nvr_tpu.datasets import synthetic
    from instant_nvr_tpu.renderer.inb_renderer import RenderSpec
    from instant_nvr_tpu.train.state import TrainState
    from instant_nvr_tpu.train.step import LossWeights, make_train_step
    from instant_nvr_tpu.models import inb
    from test_model import tiny_spec

    spec = tiny_spec()
    scene = synthetic.make_scene(n_verts=300, grid=12)
    view = synthetic.render_gt(scene, H=24, W=24)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.make_batch(scene, view, n_rays=64).items()}
    opt = optax.adam(1e-3, eps=1e-15)
    params = inb.init_params(jax.random.key(0), spec)
    rspec = RenderSpec(n_samples=8, pair_budget=64)
    losses = []
    for remat in (False, True):
        st = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))
        step = jax.jit(make_train_step(spec, rspec, LossWeights(remat=remat), opt))
        st, stats = step(st, batch, jax.random.key(0))
        losses.append(float(stats["loss"]))
    assert losses[0] == losses[1]


def test_incompatible_checkpoint_starts_fresh(tmp_path, capsys):
    """A checkpoint from a different model build (e.g. pre-scalar-grid table
    shapes) must not crash-loop an unattended resume — load_checkpoint
    returns (None, None) with a warning and training starts from scratch."""
    import jax.numpy as jnp
    import numpy as np
    from instant_nvr_tpu.train.checkpoint import save_checkpoint, load_checkpoint

    class FakeState:
        def __init__(self, params):
            self.params = params
            self.opt_state = {"mu": params}
            self.step = np.zeros((), np.int32)

        def _replace(self, **kw):
            out = FakeState(kw.get("params", self.params))
            out.opt_state = kw.get("opt_state", self.opt_state)
            return out

    old = FakeState({"table": jnp.zeros((8, 16))})
    save_checkpoint(str(tmp_path), 0, old, {"step": 0})

    new_template = FakeState({"table": jnp.zeros((8,))})  # scalar layout
    state, meta = load_checkpoint(str(tmp_path), new_template)
    assert state is None and meta is None
    assert "incompatible" in capsys.readouterr().out

    # matching template still restores
    state2, meta2 = load_checkpoint(str(tmp_path), old)
    assert state2 is not None and int(meta2["epoch"]) == 0
