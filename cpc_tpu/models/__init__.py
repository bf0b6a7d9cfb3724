from cpc_tpu.models.encoder import ConvEncoder, ScalogramEncoder  # noqa: F401
from cpc_tpu.models.gru import GRU  # noqa: F401
from cpc_tpu.models.transformer import CausalTransformer  # noqa: F401
from cpc_tpu.models.cpc import CPCModel, CPCOutput  # noqa: F401
