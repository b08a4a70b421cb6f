"""Evaluation stack: FID (patched InceptionV3), LPIPS, PPL, extraction
accuracy — the TPU rebuild of /root/reference/stylegan2/{fid,ppl,
calc_inception,inception}.py and stylegan2/lpips/."""
