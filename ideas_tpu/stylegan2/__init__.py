"""StyleGAN2 side tree: vanilla SG2 training, sampling, projection,
metrics — the TPU rebuild of /root/reference/stylegan2/."""
