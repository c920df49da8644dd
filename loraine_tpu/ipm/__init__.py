from .state import IPMState, StepStats
from .solver import solve, Result, Solver

__all__ = ["IPMState", "StepStats", "solve", "Result", "Solver"]
