from change_data_capture_spark.functions.envelope import decode_envelope, op_label

__all__ = ["decode_envelope", "op_label"]
