from .set2set import (  # noqa: F401
    hungarian,
    kinematics_pairwise_cost,
    incidence_pairwise_cost,
    set_to_set_kinematics_loss,
    set_to_set_incidence_loss,
)
