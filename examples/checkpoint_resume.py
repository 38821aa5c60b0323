"""Mid-run checkpoint/resume: run half the steps, save state to .npz,
reload in a 'new process' and finish — results identical to a straight run.

Run: python examples/checkpoint_resume.py
"""

# allow running from a source checkout without installation
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import numpy as np

from fdtd_solver_antennas_tpu import PatchAntennaParams
from fdtd_solver_antennas_tpu.post.checkpoint import load_state, save_state
from fdtd_solver_antennas_tpu.solvers.patch_fixed import prepare_patch_fixed


def main():
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )

    # segment 1: stop early, checkpoint
    prep = prepare_patch_fixed(params, n_steps_max=4000, end_criteria=1e-30)
    out = prep.sim.run()
    save_state("patch_ckpt.npz", out)
    print(f"checkpointed at step {int(out['steps'])} → patch_ckpt.npz")

    # segment 2 (could be a new process): resume to completion
    prep2 = prepare_patch_fixed(params, n_steps_max=12_000)
    out2 = prep2.sim.run(resume_state=load_state("patch_ckpt.npz"))
    print(
        f"resumed and finished at step {int(out2['steps'])}, "
        f"energy ratio {float(out2['e_ratio']):.2e}"
    )


if __name__ == "__main__":
    main()
