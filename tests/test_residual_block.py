"""ResidualBlock parity with the reference module (dead code there)."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.mlp import apply_residual_block, init_residual_block


def test_parity_with_reference(reference_nerf, rng):
    import torch

    torch.manual_seed(0)
    ref = reference_nerf.ResidualBlock(32, 64)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "linear_one": {
            "w": jnp.asarray(sd["linear_one.weight"].T),
            "b": jnp.asarray(sd["linear_one.bias"]),
        },
        "linear_two": {
            "w": jnp.asarray(sd["linear_two.weight"].T),
            "b": jnp.asarray(sd["linear_two.bias"]),
        },
        "ln": {
            "scale": jnp.asarray(sd["layer_norm.weight"]),
            "bias": jnp.asarray(sd["layer_norm.bias"]),
        },
    }
    x = rng.normal(size=(16, 32)).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.as_tensor(x)).numpy()
    got = apply_residual_block(params, jnp.asarray(x))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_init_shapes():
    p = init_residual_block(jax.random.PRNGKey(0), 32, 64)
    assert p["linear_one"]["w"].shape == (32, 64)
    assert p["linear_two"]["w"].shape == (64, 32)
    out = apply_residual_block(p, jnp.ones((4, 32)))
    assert out.shape == (4, 32)
