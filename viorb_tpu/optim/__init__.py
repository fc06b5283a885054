"""Batched LM optimization engine (the g2o replacement).

One engine, four graph schemas (SURVEY.md §7 step 3):
  (a) pose-only vision / VI with marginalized prior  -> pose_only
  (b) windowed VI BA (PVR+bias per KF + landmarks)   -> ba.vi_ba
  (c) full/vision BA                                 -> ba.vision_ba
  (d) Sim3 essential pose graph                      -> pose_graph
"""

from viorb_tpu.optim.ba import (
    BAObservations,
    VisionBAState,
    ViBAState,
    ImuChain,
    vision_ba,
    vision_ba_two_phase,
    vi_ba,
    vi_ba_two_phase,
    vi_ba_gw,
    vi_ba_gw_two_phase,
)
from viorb_tpu.optim.pose_only import (
    PoseObs,
    ViPosePrior,
    pose_optimization_tcw,
    pose_optimization_vi,
)
from viorb_tpu.optim.reprojection import Extrinsics
from viorb_tpu.optim.robust import CHI2_MONO_2DOF, CHI2_VI_9DOF
