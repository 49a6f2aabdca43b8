"""Mesh sharding tests on the 8-device virtual CPU mesh (SURVEY.md §2.10)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import transferattack_tpu as ta
from transferattack_tpu.parallel import (
    ShardedAttackRunner,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    padded, n = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(padded[5], padded[4])


def test_sharded_runner_matches_unsharded(toy_batch):
    x, y = toy_batch
    atk = ta.load_attack_class("mifgsm")(model_name="toy_cnn")
    plain = np.asarray(atk(x, y))
    atk2 = ta.load_attack_class("mifgsm")(model_name="toy_cnn")
    atk2.model = atk.model
    runner = ShardedAttackRunner(atk2, make_mesh())
    sharded = runner(x, y)
    np.testing.assert_allclose(sharded, plain, atol=1e-5)


def test_sharded_runner_pads_odd_batches(toy_batch):
    x, y = toy_batch
    atk = ta.load_attack_class("ifgsm")(model_name="toy_cnn")
    runner = ShardedAttackRunner(atk, make_mesh())
    out = runner(x[:3], y[:3])
    assert out.shape == (3,) + x.shape[1:]


def test_copies_axis_sharding_2d_mesh(toy_batch):
    """SIM's flattened copies axis pinned over a ('data','aug') mesh must
    produce the same delta as the unsharded run."""
    x, y = toy_batch
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "aug"))
    sim = ta.load_attack_class("sim")(model_name="toy_cnn", num_scale=4)
    ref = np.asarray(sim(x, y))

    sim2 = ta.load_attack_class("sim")(model_name="toy_cnn", num_scale=4)
    sim2.model = sim.model
    sim2.copies_sharding = NamedSharding(mesh, P(("aug", "data")))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    run = jax.jit(sim2.run, in_shardings=(repl, data, data, repl),
                  out_shardings=data)
    out = np.asarray(
        run(sim.model.variables, jnp.asarray(x), jnp.asarray(y),
            jax.random.PRNGKey(sim.seed))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_runner_targeted_pairs_and_host_state(toy_batch, tmp_path):
    """The sharded runner must slice (label, target) pairs like __call__ and
    route host-state attacks through their own entry point."""
    x, y = toy_batch
    target = (y + 3) % 10
    pairs = np.stack([y, target], axis=1)

    atk = ta.load_attack_class("mifgsm")(model_name="toy_cnn", targeted=True)
    ref = np.asarray(atk(x, pairs))
    atk2 = ta.load_attack_class("mifgsm")(model_name="toy_cnn", targeted=True)
    atk2.model = atk.model
    out = ShardedAttackRunner(atk2, make_mesh())(x, pairs)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # host-state attack (POTRIP keeps source labels on the host)
    pot = ta.load_attack_class("potrip")(model_name="toy_cnn", epoch=3)
    runner = ShardedAttackRunner(pot, make_mesh())
    delta = runner(x, pairs)
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= 16 / 255 + 1e-5)


def test_shardmap_ensemble_matches_sequential(toy_batch):
    """Heterogeneous members placed on a 'model' mesh axis via shard_map +
    psum logit-mean must reproduce the sequential ensemble exactly —
    forward and through a full attack loop (SURVEY.md §2.10 items 3-4)."""
    from transferattack_tpu.parallel import (data_model_mesh,
                                             mesh_ensemble_surrogate)

    x, y = toy_batch
    names = ["toy_cnn", "toy_cnn2", "toy_vit", "toy_cnn"]
    atk = ta.load_attack_class("ens")(model_name=names)
    ref_logits = np.asarray(
        atk.model.apply(atk.model.variables, jnp.asarray(x)))
    ref_delta = np.asarray(atk(x, y))

    mesh = data_model_mesh(4)  # 8 CPU devices -> (data=2, model=4)
    atk2 = ta.load_attack_class("ens")(model_name=names)
    atk2.model = mesh_ensemble_surrogate(atk.model, mesh)
    got_logits = np.asarray(
        atk2.model.apply(atk.model.variables, jnp.asarray(x)))
    np.testing.assert_allclose(got_logits, ref_logits, atol=2e-5)

    got_delta = np.asarray(atk2(x, y))
    np.testing.assert_allclose(got_delta, ref_delta, atol=1e-5)


def test_shardmap_ensemble_ind_mode(toy_batch):
    """mode='ind' all-gathers per-member logits to (K, B, C)."""
    from transferattack_tpu.parallel import (data_model_mesh,
                                             mesh_ensemble_surrogate)
    from transferattack_tpu.models import make_ensemble

    x, _ = toy_batch
    names = ["toy_cnn", "toy_cnn2"]
    ens = make_ensemble(names, mode="ind")
    ref = np.asarray(ens.apply(ens.variables, jnp.asarray(x)))

    mesh = data_model_mesh(2)
    mens = mesh_ensemble_surrogate(ens, mesh, mode="ind")
    got = np.asarray(mens.apply(ens.variables, jnp.asarray(x)))
    assert got.shape == ref.shape == (2, x.shape[0], ref.shape[-1])
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_stacked_ensemble_matches_sequential(toy_batch):
    """Homogeneous weight sets stacked on a leading member axis (the LGV
    case), vmapped and sharded over the 'model' axis, must match the
    sequential member-mean."""
    from transferattack_tpu.models import make_model
    from transferattack_tpu.parallel import (StackedEnsemble,
                                             data_model_mesh,
                                             stack_param_sets,
                                             stacked_sharding)

    x, _ = toy_batch
    base = make_model("toy_cnn")
    key = jax.random.PRNGKey(3)
    sets = []
    for i in range(4):
        key, sub = jax.random.split(key)
        leaves, treedef = jax.tree.flatten(base.variables)
        ks = jax.random.split(sub, len(leaves))
        sets.append(jax.tree.unflatten(treedef, [
            l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, ks)
        ]))
    ref = np.mean(
        [np.asarray(base.module.apply(v, jnp.asarray(x))) for v in sets],
        axis=0)

    stacked = stack_param_sets(sets)
    ens = StackedEnsemble(base, K=4)
    got = np.asarray(ens.apply(stacked, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # sharded over the model axis: jit with the stacked leaves on P('model')
    mesh = data_model_mesh(4)
    shardings = stacked_sharding(mesh, stacked)
    xsh = NamedSharding(mesh, P("data"))
    fn = jax.jit(ens.apply, in_shardings=(shardings, xsh),
                 out_shardings=NamedSharding(mesh, P("data")))
    got_sharded = np.asarray(fn(stacked, jnp.asarray(x)))
    np.testing.assert_allclose(got_sharded, ref, atol=2e-5)
