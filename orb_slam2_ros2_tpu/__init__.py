"""TPU-native SLAM engine with the capabilities of sunshanlu/ORB_SLAM2_ROS2.

A brand-new JAX/XLA/Pallas design — batched, functional, statically shaped —
not a port of the reference's C++ thread-and-pointer architecture.  See
SURVEY.md for the component inventory this framework implements.
"""

from .config import SLAMConfig  # noqa: F401

__version__ = "0.1.0"
