"""IO: dataset loaders (TUM/EuRoC/KITTI), config YAML, trajectory export,
synthetic data generation."""

from viorb_tpu.io.config import SlamConfig, parse_opencv_yaml
