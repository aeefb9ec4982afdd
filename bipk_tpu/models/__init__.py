"""Model families: SSM container and the four example systems."""

from bipk_tpu.models.ssm import GPNode, SSM

__all__ = ["GPNode", "SSM"]
