"""Component-level breakdown of the training step, honestly timed.

Where the step's milliseconds live, per subgraph, at real training
shapes — the tool behind docs/DESIGN.md §3.2/§3.3 (those sections'
numbers came from ad-hoc versions of exactly this harness; this CLI
makes the measurement repeatable).

Method (the only honest one on this tunneled runtime, CLAUDE.md rule 1):
each probe runs N iterations inside ONE compiled ``lax.scan`` and is
timed at two scan lengths around the fetch of the carry; the reported
per-iteration time is (t_long - t_short) / (n_long - n_short), which
cancels the flat dispatch/RTT cost. Two traps this harness explicitly
defeats:

* **Loop-invariant hoisting**: a probe whose input doesn't depend on
  the scan carry is computed ONCE by XLA and the loop measures nothing
  (the docs/DESIGN.md §3.2 "1.2 ms for 262M sines" incident). Every
  probe perturbs its primary input by ``carry * 1e-30``.
* **Dead-code elimination**: everything a probe computes folds into
  the next carry through a nonzero scale (``sum(out) * 1e-30``; for
  fwd+bwd probes the reduction covers EVERY gradient leaf — discarding
  any cotangent lets XLA prune that whole backward branch, which an
  earlier version of this harness did, silently timing forward-only).

The full-train-step row threads the REAL train state through the scan
(params/opt_state/step evolve; the body is
``trainer.make_multi_train_step``'s one_step verbatim), so it is
directly comparable to ``time_train_step.py``'s canonical number.

Component rows measure the subgraph in isolation (fwd, and where it
exists, fwd+bwd via ``jax.vjp`` with a ones cotangent). Isolated
backward ≠ slice of the full backward (XLA fuses across boundaries),
so rows need not sum to the total — they rank where the time goes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

from neural_waveshaping_synthesis_tpu import minigin as gin


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/train/train_newt.gin",))
@click.option("--batch-size", default=8)
@click.option("--n-frames", default=500)
@click.option("--bf16", is_flag=True, help="bfloat16 synthesis hot path")
@click.option("--n-short", default=20, help="Short scan length")
@click.option("--n-long", default=120, help="Long scan length")
@click.option("--repeats", default=3, help="Timed dispatches per length (best kept)")
@click.option("--probe", multiple=True,
              help="Run only these probes (repeatable); default all")
@click.option("--loss-variant", default="einsum",
              type=click.Choice(["einsum", "conv"]),
              help="Polyphase spectrogram formulation for the loss probes")
@click.option("--gin-binding", multiple=True,
              help="Extra gin bindings for A/Bs, e.g. 'NEWT.remat_shaper = True'")
def main(gin_file, batch_size, n_frames, bf16, n_short, n_long, repeats,
         probe, loss_variant, gin_binding):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in gin_file:
        gin.parse_config_file(os.path.join(repo, f) if not os.path.isabs(f) else f)
    if bf16:
        gin.parse_config("NeuralWaveshaping.compute_dtype = 'bfloat16'")
    for b in gin_binding:
        gin.parse_config(b)

    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
    from neural_waveshaping_synthesis_tpu.training import (
        TrainConfig,
        init_train_state,
    )
    from neural_waveshaping_synthesis_tpu.training.loss import (
        multi_resolution_stft_loss,
    )
    import optax

    from neural_waveshaping_synthesis_tpu.training.trainer import (
        compute_loss,
        make_optimizer,
    )
    from neural_waveshaping_synthesis_tpu.utils.profiling import (
        differential_scan_ms,
    )

    gin.validate_config()
    model = NeuralWaveshaping()
    cfg = TrainConfig()
    dev = jax.devices()[0]
    print(f"[profile_train_step] device={dev.platform} batch={batch_size} "
          f"frames={n_frames} bf16={bf16} "
          f"scan {n_short}/{n_long} x best-of-{repeats}")

    b, tc = batch_size, n_frames
    hop = int(model.control_hop)
    ta = tc * hop
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, ta)) * 0.1, jnp.float32)
    f0 = jnp.asarray(220.0 * 2.0 ** rng.uniform(0, 2, (b, tc)), jnp.float32)
    control = jnp.asarray(rng.standard_normal((b, tc, 2)), jnp.float32)
    audio_tgt = jnp.asarray(rng.standard_normal((b, ta)) * 0.1, jnp.float32)
    batch = {"audio": audio, "f0": f0, "control": control}
    key = jax.random.PRNGKey(1)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    params = state["params"]

    cd = jnp.dtype(model.compute_dtype)
    f0_up = jnp.repeat(f0, hop, axis=1)
    exciter = jnp.asarray(
        rng.standard_normal((b, ta, model.n_waveshapers)) * 0.3, cd
    )
    emb_width = model.embedding.embedding_size
    embedding = jnp.asarray(
        rng.standard_normal((b, tc, emb_width)), cd
    )
    newt_p = jax.tree_util.tree_map(lambda x: x.astype(cd), params["newt"])

    def fwd_bwd(f, *args):
        """sum(f(*args)) + a reduction over ALL gradient leaves — one
        fwd + one bwd pass, with every cotangent kept live (dropping
        any lets XLA prune that backward branch)."""
        out, vjp = jax.vjp(
            lambda *a: jnp.sum(f(*a)).astype(jnp.float32), *args
        )
        grads = vjp(jnp.float32(1.0))
        gsum = sum(
            jnp.sum(g).astype(jnp.float32)
            for g in jax.tree_util.tree_leaves(grads)
        )
        return out + gsum * 1e-30

    # ---- probe registry ---------------------------------------------------
    # each entry: name -> body(carry) -> new carry (see module docstring)
    def _dep(x, c):
        return x + (c * 1e-30).astype(x.dtype)

    def _fold(x):
        return jnp.sum(x).astype(jnp.float32) * 1e-30

    optimizer = make_optimizer(cfg)

    def p_full_step(st):
        # make_multi_train_step's one_step verbatim, real state carried
        step_key = jax.random.fold_in(key, st["step"])
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(model, p, batch, step_key)
        )(st["params"])
        updates, opt_state = optimizer.update(
            grads, st["opt_state"], st["params"]
        )
        return {
            "params": optax.apply_updates(st["params"], updates),
            "opt_state": opt_state,
            "step": st["step"] + 1,
            "loss_sum": st["loss_sum"] + loss,
        }

    def p_model_fwd(c):
        out = model.apply(params, _dep(f0, c), control, key=key)
        return _fold(out)

    def p_model_fwd_bwd(c):
        return fwd_bwd(
            lambda p: model.apply(p, _dep(f0, c), control, key=key), params
        ) * 1e-30

    def p_loss_fwd(c):
        return multi_resolution_stft_loss(
            _dep(audio, c), audio_tgt, spectrogram_variant=loss_variant
        ) * 1e-30

    def p_loss_fwd_bwd(c):
        return fwd_bwd(
            lambda x: multi_resolution_stft_loss(
                x, audio_tgt, spectrogram_variant=loss_variant
            ),
            _dep(audio, c),
        ) * 1e-30

    def p_control(c):
        emb, _ = model.get_embedding(params, _dep(control, c))
        return _fold(emb)

    def p_control_fwd_bwd(c):
        return fwd_bwd(
            lambda x: model.get_embedding(params, x)[0], _dep(control, c)
        ) * 1e-30

    def p_exciter(c):
        out = model.render_exciter(params, _dep(f0_up, c), key=key)
        return _fold(out)

    def p_exciter_fwd_bwd(c):
        # Training-path backward: the exciter's only parameters are the
        # 101->64 mixer weights, so the backward is dW = bank^T @ dy
        # (the bank is re-read or recomputed) + db. f0 is data — no
        # cotangent flows into the phase/sine subgraph.
        return fwd_bwd(
            lambda mp: model.render_exciter(
                {**params, "harmonic_mixer": mp}, _dep(f0_up, c), key=key
            ),
            params["harmonic_mixer"],
        ) * 1e-30

    def p_osc_bank_fwd(c):
        # The (B, Ta, 101) sinusoid bank alone: phase cumsum + wrap +
        # harmonic expansion + sines + antialias mask, no mixer.
        out = model.osc.apply(_dep(f0_up, c), key=key)
        return _fold(out)

    def p_f0_upsample(c):
        from neural_waveshaping_synthesis_tpu.ops.upsample import (
            linear_upsample,
        )
        out = linear_upsample(_dep(f0, c)[..., None], ta)[..., 0]
        return _fold(out)

    def p_newt_fwd(c):
        out = model.newt.apply(newt_p, _dep(exciter, c), embedding)
        return _fold(out)

    def p_newt_fwd_bwd(c):
        return fwd_bwd(
            lambda p, x: model.newt.apply(p, x, embedding),
            newt_p, _dep(exciter, c),
        ) * 1e-30

    def p_newt_fwd_fused(c):
        out = model.newt.apply(newt_p, _dep(exciter, c), embedding, fused=True)
        return _fold(out)

    def p_newt_fwd_bwd_fused(c):
        return fwd_bwd(
            lambda p, x: model.newt.apply(p, x, embedding, fused=True),
            newt_p, _dep(exciter, c),
        ) * 1e-30

    def p_newt_fwd_fused_fl(c):
        out = model.newt.apply(
            newt_p, _dep(exciter, c), embedding, fused="full_lane"
        )
        return _fold(out)

    def p_newt_fwd_bwd_fused_fl(c):
        return fwd_bwd(
            lambda p, x: model.newt.apply(p, x, embedding, fused="full_lane"),
            newt_p, _dep(exciter, c),
        ) * 1e-30

    def p_newt_fwd_fused_cr(c):
        out = model.newt.apply(
            newt_p, _dep(exciter, c), embedding, fused="full_lane_cr"
        )
        return _fold(out)

    def p_newt_fwd_bwd_fused_cr(c):
        return fwd_bwd(
            lambda p, x: model.newt.apply(
                p, x, embedding, fused="full_lane_cr"
            ),
            newt_p, _dep(exciter, c),
        ) * 1e-30

    def p_noise_branch(c):
        h = model.noise_mlp.apply(
            params["h_generator"], _dep(embedding, c).astype(jnp.float32)
        )
        out = model.noise_synth.apply(h, key=key)
        return _fold(out)

    def p_reverb(c):
        out = model.reverb.apply(params["reverb"], _dep(audio, c))
        return _fold(out)

    def p_adam(c):
        grads = jax.tree_util.tree_map(lambda x: _dep(x, c), params)
        updates, _ = optimizer.update(grads, state["opt_state"], params)
        leaves = jax.tree_util.tree_leaves(updates)
        return sum(_fold(u) for u in leaves)

    probes = {
        "full_train_step": (p_full_step, state),
        "model_fwd": (p_model_fwd, None),
        "model_fwd_bwd": (p_model_fwd_bwd, None),
        "loss_fwd": (p_loss_fwd, None),
        "loss_fwd_bwd": (p_loss_fwd_bwd, None),
        "control_gru_fwd": (p_control, None),
        "control_gru_fwd_bwd": (p_control_fwd_bwd, None),
        "exciter_fwd": (p_exciter, None),
        "exciter_fwd_bwd": (p_exciter_fwd_bwd, None),
        "osc_bank_fwd": (p_osc_bank_fwd, None),
        "f0_upsample": (p_f0_upsample, None),
        "newt_fwd": (p_newt_fwd, None),
        "newt_fwd_bwd": (p_newt_fwd_bwd, None),
        "newt_fwd_fused": (p_newt_fwd_fused, None),
        "newt_fwd_bwd_fused": (p_newt_fwd_bwd_fused, None),
        "newt_fwd_fused_fl": (p_newt_fwd_fused_fl, None),
        "newt_fwd_bwd_fused_fl": (p_newt_fwd_bwd_fused_fl, None),
        "newt_fwd_fused_cr": (p_newt_fwd_fused_cr, None),
        "newt_fwd_bwd_fused_cr": (p_newt_fwd_bwd_fused_cr, None),
        "noise_branch_fwd": (p_noise_branch, None),
        "reverb_fwd": (p_reverb, None),
        "adam_update": (p_adam, None),
    }
    selected = list(probe) if probe else list(probes)
    unknown = [s for s in selected if s not in probes]
    if unknown:
        raise click.UsageError(
            f"unknown probes {unknown}; available: {list(probes)}"
        )

    width = max(len(s) for s in selected)
    results = {}
    for name in selected:
        body, init = probes[name]
        ms = differential_scan_ms(body, n_short, n_long, repeats,
                                  init_carry=init)
        results[name] = ms
        print(f"  {name:<{width}}  {ms:8.3f} ms")
    total = results.get("full_train_step")
    if total:
        print(f"[profile_train_step] full step {total:.1f} ms "
              f"({1000.0 / total:.2f} steps/s)")


if __name__ == "__main__":
    main()
