"""pcp_tpu.train — jitted training step, optimizer, host loop.

Replaces the reference's train.py:40-243 training loop + GaussianModel's
optimizer management (gaussian_model.py:159-355).
"""
