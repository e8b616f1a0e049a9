"""Golden-value regression guard: the tiny model's forward must stay
numerically stable across refactors (values captured on CPU fp32,
2026-08-16). If an intentional math change moves these, re-capture and
say why in the commit."""
import jax
import jax.numpy as jnp
import numpy as np

from painter_tpu import configs
from painter_tpu.models import incontext_vit as m


def _grid(shape, seed):
    n = int(np.prod(shape))
    return ((np.arange(n, dtype=np.float64).reshape(shape) * 0.001
             + seed * 0.1) % 1.0).astype(np.float32)


def test_forward_golden_values():
    cfg = configs.tiny_test_config(seg_type_tokens=True)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    L = cfg.num_patches
    imgs = jnp.asarray(_grid((2, h, w, 3), 1))
    tgts = jnp.asarray(_grid((2, h, w, 3), 2))
    mask = jnp.zeros((2, L)).at[:, L // 2:].set(1.0)
    valid = jnp.ones((2, h, w, 3))
    st = jnp.asarray([[0], [1]], jnp.int32)
    loss, pred, _ = m.forward(params, cfg, imgs, tgts, mask, valid,
                              seg_type=st)
    p = np.asarray(pred)
    np.testing.assert_allclose(float(loss), 0.7525162100791931, rtol=1e-5)
    np.testing.assert_allclose(float(p.sum()), -2173.32861328125, rtol=1e-4)
    np.testing.assert_allclose(
        p[0, 0, :4],
        [0.8238483667373657, -0.24129362404346466,
         -0.4575721025466919, 0.4909161329269409], rtol=1e-4)
    np.testing.assert_allclose(
        p[1, -1, -4:],
        [-0.5369495153427124, -0.13434115052223206,
         -0.6072441339492798, -0.08763974905014038], rtol=1e-4)
