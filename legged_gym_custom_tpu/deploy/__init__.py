"""Deploy stack (reference deploy/): export, numpy controller, MuJoCo oracle,
gamepad, real-robot DDS client."""
from .config_parser import ConfigParser
from .controller import BaseController, NumpyAdaptationEncoder, NumpyMLP
from .export import export_policy_bundle, load_policy_bundle
