from ideas_tpu.data.pipeline import make_dataset, data_iterator

__all__ = ["make_dataset", "data_iterator"]
