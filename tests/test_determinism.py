"""Stochasticity discipline (SURVEY.md §7 hard part #3): explicit keys
make every render reproducible; distinct keys vary the stochastic
elements (oscillator phases, noise excitation) like the reference's
fresh torch.rand per forward."""
import numpy as np

import jax
import jax.numpy as jnp

from test_training import tiny_model, make_batch


def test_same_key_bit_identical(rng):
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    b = make_batch(rng, b=2)
    f0, ctrl = jnp.asarray(b["f0"]), jnp.asarray(b["control"])
    fwd = jax.jit(lambda k: model.apply(params, f0, ctrl, key=k))
    a1 = np.asarray(fwd(jax.random.PRNGKey(7)))
    a2 = np.asarray(fwd(jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(a1, a2)


def test_different_keys_differ(rng):
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    b = make_batch(rng, b=1)
    f0, ctrl = jnp.asarray(b["f0"]), jnp.asarray(b["control"])
    a1 = np.asarray(model.apply(params, f0, ctrl, key=jax.random.PRNGKey(1)))
    a2 = np.asarray(model.apply(params, f0, ctrl, key=jax.random.PRNGKey(2)))
    assert not np.array_equal(a1, a2)


def test_injected_phase_and_noise_fully_deterministic(rng):
    """The golden-test injection hooks bypass the PRNG entirely."""
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    b = make_batch(rng, b=1)
    f0, ctrl = jnp.asarray(b["f0"]), jnp.asarray(b["control"])
    po = jnp.zeros(model.osc.n_harmonics)
    noise = jnp.asarray(rng.random(f0.shape[1] * model.control_hop - 1),
                        jnp.float32)
    a1 = np.asarray(model.apply(params, f0, ctrl, phase_offset=po, noise=noise))
    a2 = np.asarray(model.apply(params, f0, ctrl, phase_offset=po, noise=noise))
    np.testing.assert_array_equal(a1, a2)
