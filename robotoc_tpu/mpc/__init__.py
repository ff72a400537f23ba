"""Whole-body MPC layer: gait MPC classes, planners, control policy
(reference include/robotoc/mpc/)."""
from .control_policy import ControlPolicy
from .foot_step_planner import (GaitFootStepPlanner, MovingWindowFilter,
                                RaibertHeuristic, TrotFootStepPlanner)
from .gait_mpc import (FEET_DEFAULT, MPCBipedWalk, MPCCrawl, MPCFlyingTrot, MPCPace,
                       PeriodicGaitMPC, crawl_foot_step_planner,
                       flying_trot_foot_step_planner,
                       pace_foot_step_planner)
from .mpc_jump import JumpFootStepPlanner, MPCJump
from .mpc_trot import MPCTrot
from .refs import StepCoMRef, StepSwingFootRef

__all__ = [
    "ControlPolicy", "GaitFootStepPlanner", "MovingWindowFilter",
    "RaibertHeuristic", "TrotFootStepPlanner", "FEET_DEFAULT", "MPCCrawl",
    "MPCBipedWalk", "MPCFlyingTrot", "MPCPace", "MPCTrot", "PeriodicGaitMPC",
    "crawl_foot_step_planner", "flying_trot_foot_step_planner",
    "pace_foot_step_planner", "StepCoMRef", "StepSwingFootRef",
    "MPCJump", "JumpFootStepPlanner",
]
