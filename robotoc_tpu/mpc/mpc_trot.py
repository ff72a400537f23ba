"""MPCTrot: packaged whole-body trot MPC for quadrupeds.

TPU-native counterpart of the reference's MPCTrot
(reference: include/robotoc/mpc/mpc_trot.hpp:40, src/mpc/mpc_trot.cpp:13-373):
builds the cost stack (configuration + 4 swing-foot + CoM), the constraint
stack (joint limits + friction cones), and a sliding trot contact schedule
driven by a foot-step planner; each control-rate update re-bakes the schedule
and reference arrays (host-side, shapes static) and runs a fixed number of
jitted Newton updates. The machinery is the generic periodic-gait MPC
(mpc/gait_mpc.py); trot is the diagonal-pair cycle.

Gait timing (feet order LF, LH, RF, RH; pairs A=(LF,RH), B=(LH,RF)):
  swing s (s = 1, 2, ...) runs [ts(s), ts(s) + swing_time],
  ts(s) = swing_start_time + (s-1) * (swing_time + stance_time);
  odd s swings pair B, even s swings pair A; touchdown is an impact event.
"""
from __future__ import annotations

from .foot_step_planner import TrotFootStepPlanner
from .gait_mpc import FEET_DEFAULT, PeriodicGaitMPC

PAIR_A = (0, 3)
PAIR_B = (1, 2)


class MPCTrot(PeriodicGaitMPC):
    CYCLE = (PAIR_B, PAIR_A)

    def make_planner(self, first_step_factor: float = 0.5, terrain=None):
        return TrotFootStepPlanner(self.model, self.feet, terrain=terrain)
