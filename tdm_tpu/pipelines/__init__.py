"""Diffusers-mirroring public inference API (reference layer D, SURVEY.md §1;
call contract §3.4): one pipeline class per model family, each with
from-components construction, LoRA verbs, and the standard
`pipe(prompt, num_inference_steps, height, width, guidance_scale, seed)`."""

from tdm_tpu.pipelines.base import DiffusionPipelineBase, PipelineOutput  # noqa: F401
from tdm_tpu.pipelines.cogvideox import CogVideoXPipeline, TDM_TRAINED_GRID  # noqa: F401
from tdm_tpu.pipelines.pixart import PixArtPipeline, default_pixart_pipeline  # noqa: F401
from tdm_tpu.pipelines.sd15 import SD15Pipeline  # noqa: F401
from tdm_tpu.pipelines.sd3 import SD3Pipeline, default_sd3_pipeline  # noqa: F401
from tdm_tpu.pipelines.loading import from_pretrained, save_pretrained  # noqa: F401
