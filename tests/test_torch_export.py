"""TorchScript export parity: torch forward == JAX forward bit-for-bit-ish."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_torchscript_matches_jax_forward(tmp_path, rng):
    import jax
    import jax.numpy as jnp
    from lira_tpu.io.torch_export import export_torchscript_mlp
    from lira_tpu.models.probing_mlp import forward, init_params

    n_bkt, dim = 12, 8
    params = init_params(jax.random.PRNGKey(3), n_bkt, dim)
    path = str(tmp_path / "m.pt")
    export_torchscript_mlp(params, path)

    loaded = torch.jit.load(path)
    loaded.eval()
    x_dist = rng.normal(size=(7, n_bkt)).astype(np.float32)
    x_vec = rng.normal(size=(7, dim)).astype(np.float32)
    with torch.no_grad():
        out_t = loaded(torch.from_numpy(x_dist), torch.from_numpy(x_vec)).numpy()
    out_j = np.asarray(forward(params, jnp.asarray(x_dist), jnp.asarray(x_vec)))
    np.testing.assert_allclose(out_t, out_j, rtol=2e-5, atol=2e-6)
