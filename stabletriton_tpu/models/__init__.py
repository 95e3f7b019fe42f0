"""Model zoo: functional JAX SDXL components (UNet, CLIP, VAE)."""
