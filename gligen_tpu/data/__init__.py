# Importing these modules populates the dataset registry.
from gligen_tpu.data import box_dataset  # noqa: F401
from gligen_tpu.data import keypoint_dataset  # noqa: F401
from gligen_tpu.data import spatial_datasets  # noqa: F401
from gligen_tpu.data.catalog import dataset_catalog  # noqa: F401
from gligen_tpu.data.concat import ConCatDataset  # noqa: F401
from gligen_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer, load_tokenizer  # noqa: F401
from gligen_tpu.data.tsv import TSVFile, TSVWriter  # noqa: F401
