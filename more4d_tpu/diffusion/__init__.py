from .flow_match import (FlowEulerScheduler, FlowDPMScheduler,
                         FlowUniPCScheduler, get_scheduler,
                         euler_sigmas, sampling_sigmas, shift_sigmas)

__all__ = [
    "FlowEulerScheduler", "FlowDPMScheduler", "FlowUniPCScheduler",
    "get_scheduler", "euler_sigmas", "sampling_sigmas", "shift_sigmas",
]
