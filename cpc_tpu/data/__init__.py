from cpc_tpu.data.dataset import SnippetDataset, ProbeDataset  # noqa: F401
from cpc_tpu.data.loader import Batcher, device_prepare  # noqa: F401
from cpc_tpu.data.synthetic import generate_synthetic_corpus  # noqa: F401
from cpc_tpu.data.wavio import read_wav, write_wav  # noqa: F401
