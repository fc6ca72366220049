"""Golden: camera-trajectory generators vs the reference's own functions.

The reference defines its five generators inside scripts/inference/infer.py
(:277-395), whose module-level imports need CUDA-only packages
(torch_scatter, unidepth), so the generator function defs are extracted
from the AST and exec'd with just their real dependencies (torch / numpy /
math / typing), then compared elementwise against geometry/cameras.py —
including the per-type radius scaling the dispatcher applies
(render_trajectory, infer.py:407-419: forward_backward 0.4*|z|,
circle_rotating 0.05*|z|, camera_rotate 30 deg)."""

import ast
import math
from typing import List, Tuple

import numpy as np
import torch

REF_INFER = "/root/reference/scripts/inference/infer.py"


def _load_ref_generators():
    tree = ast.parse(open(REF_INFER).read())
    wanted = [n for n in tree.body
              if isinstance(n, ast.FunctionDef)
              and n.name.startswith("generate_")
              and n.name.endswith("_trajectory")]
    assert len(wanted) == 5, sorted(n.name for n in wanted)
    mod = ast.Module(body=wanted, type_ignores=[])
    ns = {"torch": torch, "np": np, "math": math,
          "List": List, "Tuple": Tuple}
    exec(compile(ast.fix_missing_locations(mod), "<ref_trajectories>",
                 "exec"), ns)
    return ns


def test_trajectory_generators_match_reference():
    from more4d_tpu.geometry.cameras import generate_trajectory

    ns = _load_ref_generators()
    center = np.array([0.12, -0.3, 2.4])
    n = 17

    # the dispatcher's actual per-type parameters (infer.py:407-419)
    fb_r = 0.4 * abs(center[2])
    cr_r = 0.05 * abs(center[2])
    cases = [
        ("static", {},
         ns["generate_static_trajectory"](n)),
        # OUR DEFAULTS must equal the dispatcher's depth-scaled radii
        ("forward_backward", {},
         ns["generate_forward_backward_trajectory"](center, n, fb_r)),
        ("circle_rotating", {},
         ns["generate_circle_rotating_trajectory"](center, n, cr_r)),
        ("forward_backward", {"radius_base": fb_r},
         ns["generate_forward_backward_trajectory"](center, n, fb_r)),
        ("circle_rotating", {"radius_base": cr_r},
         ns["generate_circle_rotating_trajectory"](center, n, cr_r)),
        ("surrounding", {},
         ns["generate_surrounding_trajectory"](center, n)),
        ("camera_rotate", {"rotate_max_degree": 30},
         ns["generate_camera_rotate_trajectory"](center, n,
                                                 rotate_max_degree=30)),
        # z_progress=False sweep variants (TRAJECTORY_TYPES rows), at the
        # depth-scaled default radii
        ("forward_backward", {"z_progress": False},
         ns["generate_forward_backward_trajectory"](center, n, fb_r,
                                                    z_progress=False)),
        ("circle_rotating", {"z_progress": False},
         ns["generate_circle_rotating_trajectory"](center, n, cr_r,
                                                   z_progress=False)),
    ]
    for name, kw, ref_list in cases:
        ours = np.asarray(generate_trajectory(name, center, n, **kw))
        ref = np.stack([e.numpy() for e in ref_list])
        assert ours.shape == ref.shape == (n, 4, 4), name
        np.testing.assert_allclose(ours, ref, atol=1e-5,
                                   err_msg=f"{name} {kw}")
        # non-trivial content (guards against both sides being identity);
        # static and forward_backward-without-z-progress ARE identity by
        # design (the camera never moves)
        if name != "static" and kw.get("z_progress", True):
            assert np.abs(ref - np.eye(4)).max() > 1e-3, name
