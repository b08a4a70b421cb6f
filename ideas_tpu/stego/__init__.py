from ideas_tpu.stego.codec import message_to_tensor, tensor_to_message

__all__ = ["message_to_tensor", "tensor_to_message"]
