"""Canned run entry points (reference run_custom.py:5-62): mutate the config
dicts, then call the engine."""

from __future__ import annotations

from . import config as C
from . import engine


def test_custom_vtamiq():
    """Test-only run on CSIQ with predefined split indices
    (reference run_custom.py:5-17)."""
    g = C.global_config
    g["load_checkpoint_file"] = None
    g["do_train"] = False
    g["do_val"] = False
    g["do_test"] = True
    g["dataset"] = C.DATASET_CSIQ
    C.dataset_split_config_base["split_type"] = C.SPLIT_TYPE_INDICES
    return engine.train()


def custom_test(checkpoint_file: str):
    """Evaluate a checkpoint on the PieAPP test set
    (reference run_custom.py:20-36)."""
    g = C.global_config
    g["load_checkpoint_file"] = checkpoint_file
    g["model"] = C.MODEL_VTAMIQ
    g["do_train"] = False
    g["do_val"] = False
    g["do_test"] = True
    g["dataset"] = C.DATASET_PIEAPP_TEST
    C.dataset_split_config_base["split_type"] = C.SPLIT_TYPE_INDICES
    return engine.train()


def custom_run():
    """Debug train+val+test on TID2013 (reference run_custom.py:39-58,
    the default __main__ path)."""
    g = C.global_config
    g["is_debug"] = True
    g["dataloader_num_workers"] = 1

    g["model"] = C.MODEL_VTAMIQ
    g["load_checkpoint_file"] = None
    g["do_train"] = True
    g["do_val"] = True
    g["do_test"] = True
    g["allow_use_full_dataset_test"] = False
    g["dataset"] = C.DATASET_TID2013
    g["num_epochs"] = 20
    g["optimizer_learning_rate"] = 0.0001
    g["scheduler_type"] = "lambda"
    return engine.train()


if __name__ == "__main__":
    custom_run()
