from blt_vqg_tpu.data.augment import make_augment_fn, normalize_images
from blt_vqg_tpu.data.dataset import IQDataset, example_from_row
from blt_vqg_tpu.data.loader import make_loader, Prefetcher
from blt_vqg_tpu.data.packed import PackedDataset, pack_hdf5
from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
