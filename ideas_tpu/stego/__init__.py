from ideas_tpu.stego.codec import (
    message_from_tensor_nhwc,
    message_to_tensor,
    tensor_nhwc_from_message,
    tensor_to_message,
)

__all__ = [
    "message_from_tensor_nhwc",
    "message_to_tensor",
    "tensor_nhwc_from_message",
    "tensor_to_message",
]
