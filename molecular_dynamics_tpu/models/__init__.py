"""Model zoo: the nine generative/dynamics families of the reference
(SURVEY.md §2.5-2.11), re-built as Flax modules over dense arrays.

| family        | module         | reference canonical                         |
|---------------|----------------|---------------------------------------------|
| cGAN / GAN    | ``cgan``       | cGAN/pretrain-3.1.0, GAN_V17.12/V37         |
| RealNVP flow  | ``flows``      | cFlow/cFlow_1.0.0/cflow.py                  |
| cVAE          | ``vae``        | Autoencoder/autoencoder_v1                  |
| HNN           | ``hnn``        | Hamiltonian/Mol-HNN-cuda-v4.2               |
| neural SDE    | ``sde``        | TorchSDE/torchsde_v2/sde.py                 |
| LSTM windowed | ``seq``        | Molecule_Dynamics_v2/LSTM_V6                |
| Seq2Seq       | ``seq``        | Molecule_Dynamics_v3/Seq2Seq_V1             |
| GAT simulator | ``gat``        | Molecule_Dynamics_v1/Single_Graph_GAT_V8    |
| Transformer   | ``transformer``| Molecule_Dynamics_v1/Transformer_V2         |

Graph ops use dense attention with kNN masks (N <= a few hundred atoms —
no sparse kernels needed on TPU, SURVEY.md §2.12).
"""

from molecular_dynamics_tpu.models.common import MLP
from molecular_dynamics_tpu.models.cgan import Generator, Discriminator
from molecular_dynamics_tpu.models.hnn import HNN
from molecular_dynamics_tpu.models.vae import ConditionalVAE
from molecular_dynamics_tpu.models.flows import RealNVP
from molecular_dynamics_tpu.models.seq import (
    LSTMPredictor,
    LSTMNLLPredictor,
    Seq2Seq,
    Seq2SeqNLL,
    SequenceDiscriminator,
)
from molecular_dynamics_tpu.models.schnet import SchNet, CfConv
from molecular_dynamics_tpu.models.autoencoder import (
    MLPAutoencoder,
    LatentHNN,
    LatentDiscriminator,
)
from molecular_dynamics_tpu.models.gat import LSTMGAT
from molecular_dynamics_tpu.models.gat import GATSimulator, DenseGATLayer
from molecular_dynamics_tpu.models.transformer import TrajectoryTransformer
from molecular_dynamics_tpu.models.sde import SDEGenerator, CDEDiscriminator
from molecular_dynamics_tpu.models.node import (
    odeint_field,
    rk4_rollout,
    hnn_field,
)

__all__ = [
    "MLP",
    "Generator",
    "Discriminator",
    "HNN",
    "ConditionalVAE",
    "RealNVP",
    "LSTMPredictor",
    "LSTMNLLPredictor",
    "Seq2Seq",
    "GATSimulator",
    "DenseGATLayer",
    "TrajectoryTransformer",
    "SDEGenerator",
    "CDEDiscriminator",
    "odeint_field",
    "rk4_rollout",
    "hnn_field",
    "Seq2SeqNLL",
    "SequenceDiscriminator",
    "SchNet",
    "CfConv",
    "MLPAutoencoder",
    "LatentHNN",
    "LatentDiscriminator",
    "LSTMGAT",
]
