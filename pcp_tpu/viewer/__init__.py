"""pcp_tpu.viewer — interactive viewer socket server (network_gui parity)."""

from pcp_tpu.viewer.network_gui import NetworkGUI  # noqa: F401
