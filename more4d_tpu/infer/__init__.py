from .two_stage import (TwoStageModels, stage1_generate, render_trajectories,
                        stage2_inpaint, stage2_inpaint_dp, run_two_stage)

__all__ = ["TwoStageModels", "stage1_generate", "render_trajectories",
           "stage2_inpaint", "stage2_inpaint_dp", "run_two_stage"]
