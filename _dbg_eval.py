import numpy as np, jax, jax.numpy as jnp
from instant_nvr_tpu.config import make_cfg
from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset
from instant_nvr_tpu.models import inb
from instant_nvr_tpu.renderer.inb_renderer import make_render_spec, render_rays
from instant_nvr_tpu.train.checkpoint import load_weights
from instant_nvr_tpu.eval.runner import make_chunked_renderer, render_full_image, META_KEYS

cfg = make_cfg("configs/inb/inb_fake_mv.yaml")
mspec = inb.build_model_spec(cfg)
rspec = make_render_spec(cfg)
params = jax.jit(lambda k: inb.init_params(k, mspec))(jax.random.key(0))
params = load_weights(cfg.trained_model_dir, params)

ds = TPoseDataset(cfg, "train")  # view 0/1: training views
item = ds.get_item(0, rng=np.random.default_rng(0))  # sampled train rays
batch = {k: jnp.asarray(v) for k, v in item.items()
         if k in ("ray_o","ray_d","near","far","rgb","ray_mask","occupancy") or k in META_KEYS}

def psnr(pred, gt, m):
    mse = float((((pred - gt) ** 2).mean(-1) * m).sum() / m.sum())
    return -10 * np.log10(mse)

m = np.asarray(item["ray_mask"])
gt = np.asarray(item["rgb"])

# 1. the training-step renderer (train=True, perturb on)
ret = jax.jit(lambda p, b, r: render_rays(mspec, rspec, p, b, train=True, rng=r))(params, batch, jax.random.key(0))
print("train-path PSNR on train rays :", psnr(np.asarray(ret["rgb_map"]), gt, m))
# 2. same but train=False (eval branches)
ret2 = jax.jit(lambda p, b, r: render_rays(mspec, rspec._replace(perturb=False), p, b, train=False, rng=r))(params, batch, jax.random.key(0))
print("eval-branch PSNR on train rays:", psnr(np.asarray(ret2["rgb_map"]), gt, m))
# 3. the chunked eval renderer (inflated budgets)
render_fn = make_chunked_renderer(mspec, rspec, cfg.render_chunk)
out = render_full_image(render_fn, params, item, META_KEYS, cfg.render_chunk)
print("chunked-eval PSNR on train rays:", psnr(out["rgb_map"], gt, m))

# 4. chunked renderer WITHOUT the budget inflation
import functools
from instant_nvr_tpu.renderer.inb_renderer import render_rays as rr
@jax.jit
def render_plain(params, rays, meta):
    n = rays["ray_o"].shape[0]
    chunk = cfg.render_chunk
    nc = n // chunk
    def one_chunk(chunk_rays):
        b = dict(meta); b.update(chunk_rays)
        ret = rr(mspec, rspec._replace(perturb=False), params, b, train=False, rng=jax.random.key(0))
        return {"rgb_map": ret["rgb_map"], "acc_map": ret["acc_map"]}
    chunked = {k: rays[k].reshape(nc, chunk, *rays[k].shape[1:]) for k in ("ray_o","ray_d","near","far")}
    out = jax.lax.map(one_chunk, chunked)
    return {k: v.reshape(n, *v.shape[2:]) for k, v in out.items()}
out2 = render_full_image(render_plain, params, item, META_KEYS, cfg.render_chunk)
print("chunked-no-inflate PSNR       :", psnr(out2["rgb_map"], gt, m))
