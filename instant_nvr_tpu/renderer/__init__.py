from .inb_renderer import RenderSpec, make_render_spec, render_rays, pair_reg_loss  # noqa: F401
