from .unet import UNetConfig, unet_init, unet_apply, compute_output_shape
from .model import Model, weighted_mse_loss, multi_output_loss
from .zoo import SETUPS, get_net_config, write_net_config, model_chains
from .convert_torch import convert_checkpoint, torch_to_params
