from .cfm import sample_location_and_conditional_flow, flow_matching_loss  # noqa: F401
from .ode import odeint_fixed, odeint_dopri5, FIXED_STEP_METHODS  # noqa: F401
