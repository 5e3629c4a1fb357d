"""Pipeline layer: 4-step resumable driver (reference: src/pangaea.py)."""

from pangaea_tpu.pipeline.run import Pipeline, check_step_finished

__all__ = ["Pipeline", "check_step_finished"]
