"""TorchScript export of the probing MLP — reference-engine interop.

The reference's serving binary loads the probing model as a TorchScript
module `{prefix}_mlp_2_input.pt` (reference: index.py:180-184 writes it,
search.cpp:333-338 loads it with inputs (dist, vec)).  This converter
rebuilds that architecture in torch from our trained JAX parameter pytree
so indexes built by lira_tpu are servable by the reference engine — and so
the reference engine can be benchmarked head-to-head on identical
artifacts.  Gated on torch being importable (CPU torch suffices).
"""

from __future__ import annotations

import numpy as np


def export_torchscript_mlp(params, path: str) -> str:
    """Write `{path}` (.pt) from a probing-MLP parameter pytree.

    Layout parity: distance branch (n_bkt→128→64 ReLU), vector branch
    (dim→128→64 ReLU), head (128→128→n_bkt, ReLU then Sigmoid); forward
    signature (x_dist, x_vec) with features concatenated (dist, vec).
    """
    import torch
    from torch import nn

    def w(layer):  # our params are (fan_in, fan_out); torch.Linear stores (out, in)
        return torch.from_numpy(np.asarray(params[layer]["w"]).T.copy())

    def b(layer):
        return torch.from_numpy(np.asarray(params[layer]["b"]).copy())

    n_bkt, hidden = params["dist1"]["w"].shape
    dim = params["vec1"]["w"].shape[0]
    branch_out = params["dist2"]["w"].shape[1]
    out_dim = params["head2"]["w"].shape[1]

    class MLP2Input(nn.Module):
        def __init__(self):
            super().__init__()
            self.distance_net = nn.Sequential(
                nn.Linear(n_bkt, hidden), nn.ReLU(),
                nn.Linear(hidden, branch_out), nn.ReLU(),
            )
            self.vector_net = nn.Sequential(
                nn.Linear(dim, hidden), nn.ReLU(),
                nn.Linear(hidden, branch_out), nn.ReLU(),
            )
            self.fc = nn.Sequential(
                nn.Linear(2 * branch_out, hidden), nn.ReLU(),
                nn.Linear(hidden, out_dim), nn.Sigmoid(),
            )

        def forward(self, x_dist, x_vec):
            combined = torch.cat((self.distance_net(x_dist), self.vector_net(x_vec)), dim=1)
            return self.fc(combined)

    model = MLP2Input()
    with torch.no_grad():
        model.distance_net[0].weight.copy_(w("dist1"))
        model.distance_net[0].bias.copy_(b("dist1"))
        model.distance_net[2].weight.copy_(w("dist2"))
        model.distance_net[2].bias.copy_(b("dist2"))
        model.vector_net[0].weight.copy_(w("vec1"))
        model.vector_net[0].bias.copy_(b("vec1"))
        model.vector_net[2].weight.copy_(w("vec2"))
        model.vector_net[2].bias.copy_(b("vec2"))
        model.fc[0].weight.copy_(w("head1"))
        model.fc[0].bias.copy_(b("head1"))
        model.fc[2].weight.copy_(w("head2"))
        model.fc[2].bias.copy_(b("head2"))
    model.eval()
    torch.jit.script(model).save(path)
    return path
