from .imageio import imread, transform_img, IMAGENET_NORM_MEAN, IMAGENET_NORM_STD
from .datasets import (
    dataset_split, DATASETS_DEFAULT_PATH, SPLIT_NAME_FULL,
    ImageDataset, IQADataset, PatchFRIQADataset, PairwiseFRIQAPatchDataset,
    TID2013Dataset, TID2008Dataset, KADID10kDataset, LIVEDataset, CSIQDataset,
    PIPAL, PIPALTest, PIPALVal, PIPALVal22, PIPALTest22,
    PieAPPTrainPairwise, PieAPPTestset, KADIS700kDataset, KonIQ10kDataset,
)
from .pipeline import PatchDatasetLoader, ImageBatch
