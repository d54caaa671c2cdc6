"""Model families: ClassicNeRF (v1.2) and MipNeRF (HEAD)."""
