"""Pipeline base: the diffusers-mirroring public inference API.

The reference's de-facto serving API is the diffusers pipeline call
convention (SURVEY.md §1 layer D, §3.4): `from_pretrained`,
`load_lora_weights(path, adapter_name)`, `set_adapters([names], [scales])`,
scheduler swap, then `pipe(prompt, negative_prompt, num_inference_steps,
height, width, guidance_scale, generator)`. This module provides those verbs
once; each model family subclasses with its denoiser/encoder/VAE wiring.

TPU-native mechanics under the hood:
  * the whole K-NFE loop (denoiser forwards + scheduler math + CFG) is ONE
    jitted program (core.solvers / core.sampling), cached per static
    (steps, H, W, cfg-on) signature — repeat calls at the same shape hit the
    compiled executable directly;
  * "generator" is a JAX PRNG seed (torch RNG streams are not reproducible
    in JAX — parity is defined on decoded grids, SURVEY.md §7 hard parts);
  * LoRA adapters merge into the base params on device; `set_adapters`
    re-merges from the pristine base (README.md:50: scale 0.125).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from tdm_tpu import lora as lora_lib


@dataclass
class PipelineOutput:
    """images: [B, H, W, 3] float32 in [0, 1] (or videos [B, F, H, W, 3])."""

    images: Any
    latents: Any = None

    @property
    def frames(self) -> Any:
        """diffusers' video accessor (`pipe(...).frames[0]`, reference
        README.md:133-135): the decoded [B, F, H, W, 3] array. Only video
        outputs have it — image outputs raise, like diffusers' image
        pipeline outputs."""
        if self.images is not None and getattr(self.images, "ndim", 0) == 5:
            return self.images
        raise AttributeError(
            "frames is only available on decoded video outputs "
            "([B,F,H,W,3]); use .images for decoded images, or .latents "
            "when the pipeline ran with output_type='latent'"
        )


class DiffusionPipelineBase:
    """Shared LoRA management + jit caching. Subclasses set `base_params`
    (the denoiser's pristine param tree) and implement `_build_sampler`."""

    family: str = ""  # loading.FAMILIES key, set per subclass

    def __init__(self):
        self._loras: dict[str, lora_lib.LoRA] = {}
        self._active: tuple = ()  # ((name, scale), ...)
        self._jit_cache: dict = {}
        self._jit_lock = threading.Lock()
        self.base_params: Any = None
        self.params: Any = None  # base with active adapters merged
        # 'int8' → dynamic int8 MXU matmuls for the big Dense layers
        # (ops/quant.py; ~1.7× measured on v5e). Set `pipe.quant = "int8"`.
        self.quant: Optional[str] = None
        # serving meshes — see the `data_parallel_mesh` /
        # `tensor_parallel_mesh` properties below
        self._dp_mesh: Optional[Any] = None
        self._tp_mesh: Optional[Any] = None
        self._tp_shardings_cache: Optional[tuple] = None  # (mesh, tree)

    # data-parallel serving: a jax Mesh with a 'data' axis (classic
    # jax.sharding.Mesh constructor — NOT jax.make_mesh, whose
    # Explicit-mode axes bypass the flash kernel's partitioning rule).
    # When set, calls shard the batch axis of every input over 'data' and
    # replicate the params; the jitted sampler then compiles SPMD over
    # the mesh (computation follows sharding — no per-family code).
    # The reference's only parallelism is DP (src/main.py:321-323);
    # this is its serving-side equivalent. Batch must divide n.
    @property
    def data_parallel_mesh(self):
        return self._dp_mesh

    @data_parallel_mesh.setter
    def data_parallel_mesh(self, mesh):
        if mesh is not None and self._tp_mesh is not None:
            raise ValueError(
                "data_parallel_mesh and tensor_parallel_mesh are mutually "
                "exclusive — a ('data','tp') tensor_parallel_mesh already "
                "carries the batch axis"
            )
        self._dp_mesh = mesh

    # tensor-parallel serving: a ('data','tp') mesh (parallel/tp.py's
    # make_tp_mesh). Params are megatron-sharded over 'tp' (attention/FF
    # projections column/row-parallel), batch over 'data' — scales
    # LATENCY even at batch 1, which DP cannot. Subsumes DP (use the
    # mesh's 'data' axis); mutually exclusive with data_parallel_mesh.
    @property
    def tensor_parallel_mesh(self):
        return self._tp_mesh

    @tensor_parallel_mesh.setter
    def tensor_parallel_mesh(self, mesh):
        if mesh is not None and self._dp_mesh is not None:
            raise ValueError(
                "data_parallel_mesh and tensor_parallel_mesh are mutually "
                "exclusive — a ('data','tp') tensor_parallel_mesh already "
                "carries the batch axis"
            )
        self._tp_mesh = mesh

    # ---- LoRA verbs (README.md:45-50,70,96,119) ----

    def load_lora_weights(self, path: str, adapter_name: str = "default") -> None:
        self._loras[adapter_name] = lora_lib.load_lora(
            path, params=self.base_params
        )
        self.set_adapters([adapter_name], [1.0])

    def set_adapters(
        self, names: Sequence[str], scales: Optional[Sequence[float]] = None
    ) -> None:
        """Re-merge the named adapters at the given scales into a fresh copy
        of the base params. scale 0 == adapter off (the reference's teacher
        baseline trick, README.md:69-71)."""
        scales = list(scales) if scales is not None else [1.0] * len(names)
        params = self.base_params
        for name, scale in zip(names, scales):
            if scale != 0.0:
                params = lora_lib.merge(params, self._loras[name], scale)
        self.params = params
        self._active = tuple(zip(names, scales))
        # no jit-cache clear needed: params are jit ARGUMENTS, so the same
        # compiled sampler serves any adapter mix at zero recompile cost

    # ---- jit cache ----

    def _jit_component(
        self, name: str, build: Callable[[], Callable]
    ) -> Callable:
        """Cached jit for an auxiliary component forward (text encoder, VAE
        decode). Eager `Module.apply` dispatches per-op — ~100 ms round-trip
        each over the axon tunnel (docs/ENVIRONMENT_NOTES.md #2), which
        would dominate per-request serving latency. Params stay jit
        ARGUMENTS (repo invariant). Distinct batch sizes re-specialize via
        jit's own shape cache."""
        key = ("component", name)
        fn = self._jit_cache.get(key)
        if fn is None:
            # serving calls this from concurrent request threads — the lock
            # prevents duplicate multi-second cold compiles on a cache miss
            with self._jit_lock:
                fn = self._jit_cache.get(key)
                if fn is None:
                    fn = self._jit_cache[key] = jax.jit(build())
        return fn

    def _cached(self, key: tuple, build: Callable[[], Callable]) -> Callable:
        # int8/bf16 and dp/tp/single-chip variants compile separately
        key = (
            *key,
            self.quant,
            self.data_parallel_mesh is not None,
            self.tensor_parallel_mesh is not None,
        )
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = self._with_dp(
                self._with_quant_scope(build())
            )
        return fn

    def _with_dp(self, fn: Callable) -> Callable:
        """Shard call inputs over `data_parallel_mesh` before invoking the
        jitted sampler: batch axis of every data array over 'data', params
        replicated. jit compiles the SPMD program from the input shardings
        alone, so every family's sampler parallelizes without family code.
        Samplers follow the `fn(params, *data)` convention (see callers).

        Tensor-parallel serving rides the same wrapper: with
        `tensor_parallel_mesh` set, params are placed by the megatron rule
        (parallel/tp.py) instead of replicated, and the batch shards over
        the mesh's 'data' axis.

        The CURRENT mesh is read at every call (not captured at build):
        reassigning `pipe.data_parallel_mesh` / `pipe.tensor_parallel_mesh`
        takes effect immediately — jit reshards/recompiles per the new
        input shardings."""
        if self.data_parallel_mesh is None and self.tensor_parallel_mesh is None:
            return fn
        # (dp/tp mutual exclusion is enforced at assignment — see the
        # property setters.) quant='int8' composes with tp: the interceptor
        # traces GLOBAL shapes, so the dynamic absmax reductions over
        # sharded dims lower to all-reduce-max collectives — scales (and
        # results) match the unsharded int8 path (validated:
        # test_quant.py::test_int8_under_tp)
        from jax.sharding import NamedSharding, PartitionSpec as P

        pipe = self

        def wrapped(params, *data):
            mesh = pipe.tensor_parallel_mesh or pipe.data_parallel_mesh
            if mesh is None:  # parallelism switched off after caching
                return fn(params, *data)
            n = mesh.shape["data"] if "data" in mesh.axis_names else 1

            def shard_data(x):
                if not hasattr(x, "ndim") or x.ndim == 0 or n == 1:
                    if hasattr(x, "ndim"):
                        return jax.device_put(x, NamedSharding(mesh, P()))
                    return x
                if x.shape[0] % n != 0:
                    raise ValueError(
                        f"batch {x.shape[0]} does not divide the 'data' "
                        f"mesh axis ({n} devices) — pad the prompt list"
                    )
                spec = P("data", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

            def replicate(x):
                if not hasattr(x, "ndim"):
                    return x
                return jax.device_put(x, NamedSharding(mesh, P()))

            if pipe.tensor_parallel_mesh is not None:
                from tdm_tpu.parallel import tp as tp_lib

                # the shardings pytree is pure metadata derived from
                # (mesh, tree structure) — cache it so the latency-oriented
                # tp path doesn't rebuild hundreds of NamedShardings per
                # call (device_put on already-placed arrays is a no-op)
                tdef = jax.tree.structure(params)
                cache = pipe._tp_shardings_cache
                if cache is not None and cache[0] is mesh and cache[1] == tdef:
                    shardings = cache[2]
                else:
                    shardings = tp_lib.tp_shardings(params, mesh)
                    pipe._tp_shardings_cache = (mesh, tdef, shardings)
                params = jax.device_put(params, shardings)
            else:
                params = jax.tree.map(replicate, params)
            data = jax.tree.map(shard_data, data)
            return fn(params, *data)

        return wrapped

    def _with_quant_scope(self, fn: Callable) -> Callable:
        """Run `fn` under the active quantization scope so its FIRST call
        (the jit trace) reroutes big Dense matmuls (ops/quant.py); later
        calls hit the compiled executable and the scope is a no-op."""
        if not self.quant:
            return fn
        from tdm_tpu.ops import quant as quant_lib

        mode = self.quant

        def wrapped(*args, **kwargs):
            with quant_lib.quant_scope(mode):
                return fn(*args, **kwargs)

        return wrapped

    # ---- persistence (the diffusers pipe.save_pretrained verb) ----

    def save_pretrained(self, path: str) -> None:
        """Write this pipeline as a loading.py layout-1 directory, loadable
        with `from_pretrained(path)`. Bundles the PRISTINE base params
        (adapter merges are runtime state — re-load LoRA files after), the
        VAE decoder when attached, and a single attached text encoder
        (T5/CLIP) with its tokenizer spec — so a pipeline assembled from a
        stock diffusers checkout round-trips with prompts working. SD3's
        triple-encoder stack is the exception (use cached embeddings or
        the functional `loading.save_pretrained`)."""
        import logging
        import os

        from tdm_tpu.pipelines import loading

        denoiser = getattr(self, "transformer", None) or self.unet
        vae_cfg = None
        if getattr(self, "vae_decoder", None) is not None:
            vae_cfg = self.vae_decoder.cfg
        elif getattr(self, "vae_cfg", None) is not None:
            vae_cfg = self.vae_cfg

        text_kw: dict = {}
        enc = getattr(self, "text_encoder", None)
        enc_family = {"T5Encoder": "t5", "CLIPTextEncoder": "clip"}.get(
            type(enc).__name__
        )
        if enc is not None and enc_family is not None:
            from tdm_tpu.data.tokenizer import HashTokenizer, HFTokenizer

            spec = {
                "family": enc_family,
                "config": loading.config_dict(enc.cfg),
            }
            tok = getattr(self, "tokenizer", None)
            if isinstance(tok, HashTokenizer):
                spec["tokenizer"] = {
                    "kind": "hash",
                    "vocab_size": tok.vocab_size,
                    "eos_id": tok.eos_id,
                }
            elif isinstance(tok, HFTokenizer) and os.path.isdir(tok.path):
                spec["tokenizer"] = {"kind": "hf"}
                text_kw["tokenizer_dir"] = tok.path
            elif tok is not None:
                # other tokenizers (hub-id HFTokenizer, test fakes, custom
                # callables) can't be serialized — the encoder still
                # bundles, but raw-prompt calls on the reloaded pipeline
                # need a tokenizer reattached. Warn NOW, not at first
                # prompt after reload.
                logging.getLogger(__name__).warning(
                    "save_pretrained: tokenizer %r cannot be bundled "
                    "(not a local-dir HFTokenizer or HashTokenizer); the "
                    "reloaded pipeline will have tokenizer=None — "
                    "reattach one before passing raw prompts",
                    tok,
                )
            text_kw.update(
                text_encoder_params=self.text_encoder_params,
                text_encoder_config=spec,
            )

        loading.save_pretrained(
            path,
            family=self.family,
            transformer_params=self.base_params,
            model_config=loading.config_dict(denoiser.cfg),
            vae_params=getattr(self, "vae_params", None),
            vae_config=(
                loading.config_dict(vae_cfg) if vae_cfg is not None else None
            ),
            **text_kw,
        )

    # ---- misc ----

    @staticmethod
    def rng(seed: Optional[int], generator: Optional[jax.Array]) -> jax.Array:
        """`generator` (a PRNG key) wins; else `seed`; else seed 0 — mirrors
        the fixed-seed recipes (8888 / 317 / 42, README.md:57,98,133)."""
        if generator is not None:
            return generator
        return jax.random.PRNGKey(0 if seed is None else seed)

    @staticmethod
    def check_negative_prompt(
        negative_prompt: Optional[Sequence[str]], batch_size: int
    ) -> Optional[Sequence[str]]:
        """diffusers' `check_inputs` parity, returning the NORMALIZED value:
        a plain str broadcasts to every prompt (diffusers semantics — it
        must not be length-checked as a character sequence); a list whose
        length disagrees with the prompt batch fails as a clear ValueError
        at the Python boundary, not as an opaque XLA shape error inside the
        jitted sampler."""
        if negative_prompt is None:
            return None
        if isinstance(negative_prompt, str):
            return [negative_prompt] * batch_size
        if len(negative_prompt) != batch_size:
            raise ValueError(
                f"negative_prompt has {len(negative_prompt)} entries but "
                f"the prompt batch is {batch_size}; pass one negative "
                "prompt per prompt (or a single str for all)"
            )
        return negative_prompt

    @staticmethod
    def repeat_per_prompt(tree: Any, n: int) -> Any:
        """diffusers' `num_images_per_prompt` semantics (the Dreamshaper
        recipe passes it, reference README.md:103): tile every batch-axis
        leaf of a conditioning tree n× with repeat_interleave order, so
        prompt i's images occupy rows [i·n, (i+1)·n). Applied to cond AND
        uncond trees before the batch size is read — the sampler then runs
        one [B·n]-batched jitted call."""
        if n == 1 or tree is None:
            return tree
        if n < 1:
            raise ValueError(f"num_images_per_prompt must be >= 1, got {n}")
        return jax.tree.map(
            lambda x: (
                jnp.repeat(jnp.asarray(x), n, axis=0)
                if hasattr(x, "ndim") and getattr(x, "ndim", 0) > 0
                else x
            ),
            tree,
        )

    @staticmethod
    def initial_noise(
        latents: Optional[Any], rng: jax.Array, shape: tuple
    ) -> jnp.ndarray:
        """diffusers' `latents=` escape hatch: caller-provided initial noise
        (e.g. the serving batcher's per-request noise rows, serve/batcher.py)
        wins over seed/generator; otherwise sample from `rng`."""
        if latents is None:
            return jax.random.normal(rng, shape, jnp.bfloat16)
        latents = jnp.asarray(latents, jnp.bfloat16)
        if tuple(latents.shape) != tuple(shape):
            raise ValueError(
                f"latents shape {tuple(latents.shape)} != expected {tuple(shape)}"
            )
        return latents


def to_images(decoded: jnp.ndarray, *, value_range: str = "unit") -> jnp.ndarray:
    """VAE decode output → [B, H, W, 3] (or [B, F, H, W, 3]) float32 in
    [0,1]. `value_range`: 'unit' for TAESD ([0,1] native), 'pm1' for KL
    VAEs ([-1,1] → /2+0.5, the standard diffusers postprocess)."""
    x = decoded.astype(jnp.float32)
    if value_range == "pm1":
        x = x / 2.0 + 0.5
    x = jnp.clip(x, 0.0, 1.0)
    if x.ndim == 4:  # [B,3,H,W]
        return jnp.transpose(x, (0, 2, 3, 1))
    return jnp.transpose(x, (0, 2, 3, 4, 1))  # [B,3,F,H,W] → [B,F,H,W,3]
