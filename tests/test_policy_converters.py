"""Full-policy checkpoint conversion + forward parity for CMA / Seq2Seq.

Builds torch replicas with the EXACT reference module/parameter naming
(cma_policy.py:131-242, seq2seq_policy.py:128-179, resnet_encoders.py,
resnet.py — torchvision isn't installed, so the towers are hand-rolled with
matching state-dict keys), implements the reference `_forward` faithfully
in torch, converts the state dict with convert_{cma,seq2seq}_policy, and
asserts logits/states/progress parity including inference-mode argmax.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _sd_numpy(module):
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in module.state_dict().items()}


# --------------------------------------------------- torch reference pieces
class _TVBottleneck(tnn.Module):
    """torchvision Bottleneck (BN) with matching parameter names."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


class _SpatialAvgPool(tnn.Module):
    def forward(self, x):
        return F.adaptive_avg_pool2d(x, (4, 4))


def _tv_resnet50_cnn(spatial: bool):
    """The reference's `self.cnn` Sequential (resnet_encoders.py:144-166):
    indices 0=conv1 1=bn1 2=relu 3=maxpool 4..7=layer1..4 (+pool)."""
    def layer(cin, planes, blocks, stride):
        mods = [_TVBottleneck(cin, planes, stride)]
        mods += [_TVBottleneck(planes * 4, planes) for _ in range(blocks - 1)]
        return tnn.Sequential(*mods)

    mods = [
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64),
        tnn.ReLU(), tnn.MaxPool2d(3, 2, 1),
        layer(64, 64, 3, 1), layer(256, 128, 4, 2),
        layer(512, 256, 6, 2), layer(1024, 512, 3, 2),
    ]
    mods.append(_SpatialAvgPool() if spatial else tnn.AdaptiveAvgPool2d((1, 1)))
    return tnn.Sequential(*mods)


class TorchTVResNetRGB(tnn.Module):
    """Reference TorchVisionResNet (spatial or fc mode)."""

    def __init__(self, spatial=True, output_size=256):
        super().__init__()
        self.cnn = _tv_resnet50_cnn(spatial)
        self.spatial = spatial
        if spatial:
            self.spatial_embeddings = tnn.Embedding(16, 64)
        else:
            self.fc = tnn.Sequential(tnn.Flatten(),
                                     tnn.Linear(2048, output_size), tnn.ReLU())

    def forward(self, rgb_bhwc):
        x = rgb_bhwc.permute(0, 3, 1, 2).contiguous() / 255.0
        out = self.cnn(x)
        if not self.spatial:
            return self.fc(out)
        b, c, h, w = out.size()
        sp = self.spatial_embeddings(
            torch.arange(16)).view(1, -1, h, w).expand(b, 64, h, w)
        return torch.cat([out, sp], dim=1)


class _GNBottleneck(tnn.Module):
    """Reference resnet.py Bottleneck: convs Sequential indices 0,1,3,4,6,7."""

    def __init__(self, cin, planes, ngroups, stride=1):
        super().__init__()
        cout = planes * 4
        self.convs = tnn.Sequential(
            tnn.Conv2d(cin, planes, 1, bias=False), tnn.GroupNorm(ngroups, planes),
            tnn.ReLU(True),
            tnn.Conv2d(planes, planes, 3, stride, 1, bias=False),
            tnn.GroupNorm(ngroups, planes), tnn.ReLU(True),
            tnn.Conv2d(planes, cout, 1, bias=False), tnn.GroupNorm(ngroups, cout),
        )
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.GroupNorm(ngroups, cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        return torch.relu(self.convs(x) + idn)


class _GNBackbone(tnn.Module):
    """Reference resnet.py ResNet (resnet50: bottleneck (3,4,6,3))."""

    def __init__(self, in_ch=1, base=32, ngroups=16):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(in_ch, base, 7, 2, 3, bias=False),
            tnn.GroupNorm(ngroups, base), tnn.ReLU(True))
        self.maxpool = tnn.MaxPool2d(3, 2, 1)

        def layer(cin, planes, blocks, stride):
            mods = [_GNBottleneck(cin, planes, ngroups, stride)]
            mods += [_GNBottleneck(planes * 4, planes, ngroups)
                     for _ in range(blocks - 1)]
            return tnn.Sequential(*mods)

        self.layer1 = layer(base, base, 3, 1)
        self.layer2 = layer(base * 4, base * 2, 4, 2)
        self.layer3 = layer(base * 8, base * 4, 6, 2)
        self.layer4 = layer(base * 16, base * 8, 3, 2)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x


class TorchDepthEncoder(tnn.Module):
    """Reference VlnResnetDepthEncoder: ResNetEncoder(visual_encoder) +
    spatial embeddings or visual_fc."""

    def __init__(self, spatial=True, output_size=128, spatial_tokens=16,
                 final_channels=256, compress_c=128):
        super().__init__()
        ve = tnn.Module()
        ve.backbone = _GNBackbone()
        ve.compression = tnn.Sequential(
            tnn.Conv2d(final_channels * 4, compress_c, 3, 1, 1, bias=False),
            tnn.GroupNorm(1, compress_c), tnn.ReLU(True))
        self.visual_encoder = ve
        self.spatial = spatial
        if spatial:
            self.spatial_embeddings = tnn.Embedding(spatial_tokens, 64)
        else:
            flat = compress_c * spatial_tokens
            self.visual_fc = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(flat, output_size), tnn.ReLU())

    def forward(self, depth_bhwc):
        x = depth_bhwc.permute(0, 3, 1, 2)
        x = F.avg_pool2d(x, 2)
        x = self.visual_encoder.backbone(x)
        x = self.visual_encoder.compression(x)
        if not self.spatial:
            return self.visual_fc(x)
        b, c, h, w = x.size()
        sp = self.spatial_embeddings(
            torch.arange(h * w)).view(1, -1, h, w).expand(b, 64, h, w)
        return torch.cat([x, sp], dim=1)


class TorchInstructionEncoder(tnn.Module):
    """Reference InstructionEncoder (LSTM, bidirectional)."""

    def __init__(self, vocab, emb, hidden, final_state_only=False):
        super().__init__()
        self.encoder_rnn = tnn.LSTM(input_size=emb, hidden_size=hidden,
                                    bidirectional=True)
        self.embedding_layer = tnn.Embedding(vocab, emb, padding_idx=0)
        self.final_state_only = final_state_only

    def forward(self, tokens):
        lengths = (tokens != 0).long().sum(dim=1).cpu()
        emb = self.embedding_layer(tokens.long())
        packed = tnn.utils.rnn.pack_padded_sequence(
            emb, lengths, batch_first=True, enforce_sorted=False)
        output, final_state = self.encoder_rnn(packed)
        if self.final_state_only:
            return final_state[0].permute(1, 0, 2).reshape(tokens.shape[0], -1)
        out = tnn.utils.rnn.pad_packed_sequence(
            output, batch_first=True, total_length=tokens.shape[1])[0]
        return out.permute(0, 2, 1)  # (B, C, L)


def _gru_step(gru, x, h, masks):
    """habitat RNNStateEncoder single-step semantics: hidden zeroed at
    episode starts (masks 0)."""
    h_in = (h * masks.view(1, -1, 1))
    out, h_out = gru(x.unsqueeze(0), h_in.contiguous())
    return out.squeeze(0), h_out


class TorchCMA(tnn.Module):
    """Reference CMANet with exact names + faithful _forward
    (cma_policy.py:131-242, 268-325)."""

    def __init__(self, vocab=200, emb=50, txt_hidden=128, hidden=512,
                 rgb_out=256, depth_out=128):
        super().__init__()
        H = hidden
        self.instruction_encoder = TorchInstructionEncoder(vocab, emb, txt_hidden)
        self.depth_encoder = TorchDepthEncoder(spatial=True)
        self.rgb_encoder = TorchTVResNetRGB(spatial=True)
        self.prev_action_embedding = tnn.Embedding(5, 32)
        self.rgb_linear = tnn.Sequential(
            tnn.AdaptiveAvgPool1d(1), tnn.Flatten(),
            tnn.Linear(2112, rgb_out), tnn.ReLU(True))
        self.depth_linear = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(3072, depth_out), tnn.ReLU(True))
        rnn_in = depth_out + rgb_out + 32
        se = tnn.Module()
        se.rnn = tnn.GRU(rnn_in, H)
        self.state_encoder = se
        self.rgb_kv = tnn.Conv1d(2112, H // 2 + rgb_out, 1)
        self.depth_kv = tnn.Conv1d(192, H // 2 + depth_out, 1)
        self.state_q = tnn.Linear(H, H // 2)
        self.text_k = tnn.Conv1d(2 * txt_hidden, H // 2, 1)
        self.text_q = tnn.Linear(2 * txt_hidden, H // 2)
        sse = tnn.Module()
        sse.rnn = tnn.GRU(H, H)
        self.second_state_encoder = sse
        out_size = H + rgb_out + depth_out + 2 * txt_hidden
        self.second_state_compress = tnn.Sequential(
            tnn.Linear(out_size + 32, H), tnn.ReLU(True))
        self.progress_monitor = tnn.Linear(H, 1)
        ad = tnn.Module()
        ad.linear = tnn.Linear(H, 4)
        self.action_distribution = ad
        self._scale = 1.0 / ((H // 2) ** 0.5)
        self._H = H

    def forward(self, obs, rnn_states, prev_actions, masks):
        instruction_embedding = self.instruction_encoder(obs["instruction"])
        depth_embedding = torch.flatten(self.depth_encoder(obs["depth"]), 2)
        rgb_embedding = torch.flatten(self.rgb_encoder(obs["rgb"]), 2)
        prev = self.prev_action_embedding(
            ((prev_actions.float() + 1) * masks).long().view(-1))
        rgb_in = self.rgb_linear(rgb_embedding)
        depth_in = self.depth_linear(depth_embedding)
        state_in = torch.cat([rgb_in, depth_in, prev], dim=1)
        rnn_states_out = rnn_states.detach().clone()
        h1 = rnn_states[:, 0:1].permute(1, 0, 2)
        state, h1o = _gru_step(self.state_encoder.rnn, state_in, h1, masks)
        rnn_states_out[:, 0:1] = h1o.permute(1, 0, 2)

        def attn(q, k, v, mask=None):
            logits = torch.einsum("nc,nci->ni", q, k)
            if mask is not None:
                logits = logits - mask.float() * 1e8
            a = F.softmax(logits * self._scale, dim=1)
            return torch.einsum("ni,nci->nc", a, v)

        text_q1 = self.state_q(state)
        text_k = self.text_k(instruction_embedding)
        text_mask = (instruction_embedding == 0.0).all(dim=1)
        text_emb = attn(text_q1, text_k, instruction_embedding, text_mask)
        rgb_k, rgb_v = torch.split(self.rgb_kv(rgb_embedding), self._H // 2, dim=1)
        depth_k, depth_v = torch.split(self.depth_kv(depth_embedding), self._H // 2, dim=1)
        tq = self.text_q(text_emb)
        rgb_att = attn(tq, rgb_k, rgb_v)
        depth_att = attn(tq, depth_k, depth_v)
        x = torch.cat([state, text_emb, rgb_att, depth_att, prev], dim=1)
        x = self.second_state_compress(x)
        h2 = rnn_states[:, 1:2].permute(1, 0, 2)
        x, h2o = _gru_step(self.second_state_encoder.rnn, x, h2, masks)
        rnn_states_out[:, 1:2] = h2o.permute(1, 0, 2)
        progress = torch.tanh(self.progress_monitor(x))
        logits = self.action_distribution.linear(x)
        return logits, rnn_states_out, progress


class TorchSeq2Seq(tnn.Module):
    """Reference Seq2SeqNet (seq2seq_policy.py:128-236), no prev action."""

    def __init__(self, vocab=200, emb=50, txt_hidden=128, hidden=512,
                 rgb_out=256, depth_out=128):
        super().__init__()
        self.instruction_encoder = TorchInstructionEncoder(
            vocab, emb, txt_hidden, final_state_only=True)
        self.depth_encoder = TorchDepthEncoder(spatial=False, output_size=depth_out)
        self.rgb_encoder = TorchTVResNetRGB(spatial=False, output_size=rgb_out)
        se = tnn.Module()
        se.rnn = tnn.GRU(2 * txt_hidden + depth_out + rgb_out, hidden)
        self.state_encoder = se
        self.progress_monitor = tnn.Linear(hidden, 1)
        ad = tnn.Module()
        ad.linear = tnn.Linear(hidden, 4)
        self.action_distribution = ad

    def forward(self, obs, rnn_states, prev_actions, masks):
        instr = self.instruction_encoder(obs["instruction"])
        depth = self.depth_encoder(obs["depth"])
        rgb = self.rgb_encoder(obs["rgb"])
        x = torch.cat([instr, depth, rgb], dim=1)
        h = rnn_states[:, 0:1].permute(1, 0, 2)
        x, ho = _gru_step(self.state_encoder.rnn, x, h, masks)
        progress = torch.tanh(self.progress_monitor(x))
        return (self.action_distribution.linear(x),
                ho.permute(1, 0, 2), progress)


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)


def _obs(rs, B=2, L=24):
    tokens = np.zeros((B, L), np.int64)
    for i, n in enumerate([14, 9][:B]):
        tokens[i, :n] = rs.randint(2, 190, size=n)
    return {
        "instruction": tokens,
        "rgb": rs.randint(0, 255, (B, 224, 224, 3)).astype(np.float32),
        "depth": rs.uniform(0, 1, (B, 256, 256, 1)).astype(np.float32),
    }


@pytest.mark.slow
def test_cma_policy_conversion_forward_parity():
    from internnav_tpu.model import get_config, get_policy
    from internnav_tpu.model.weights.convert import convert_cma_policy

    torch.manual_seed(0)
    ref = TorchCMA(vocab=get_config("cma").text_encoder.vocab_size).eval()
    _randomize_bn(ref)
    sd = _sd_numpy(ref)
    params = convert_cma_policy(sd)

    rs = np.random.RandomState(1)
    obs = _obs(rs)
    B = 2
    rnn_states = rs.randn(B, 2, 512).astype(np.float32)
    prev_actions = np.array([2, 0], np.int64)
    masks = np.array([1.0, 1.0], np.float32)

    with torch.no_grad():
        t_logits, t_states, t_prog = ref(
            {k: torch.tensor(v) for k, v in obs.items()},
            torch.tensor(rnn_states), torch.tensor(prev_actions),
            torch.tensor(masks),
        )

    pol = get_policy("cma").build(get_config("cma"))
    pol.params = params
    logits, states, prog = pol.forward({
        "observations": {k: jnp.asarray(v) for k, v in obs.items()},
        "rnn_states": jnp.asarray(rnn_states),
        "prev_actions": jnp.asarray(prev_actions),
        "masks": jnp.asarray(masks),
        "mode": "train",
    })
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=6e-3, rtol=6e-3)
    np.testing.assert_allclose(np.asarray(prog), t_prog.numpy(), atol=6e-3,
                               rtol=6e-3)
    np.testing.assert_allclose(np.asarray(states), t_states.numpy(),
                               atol=6e-3, rtol=6e-3)
    # inference mode: identical greedy actions
    acts, _, _ = pol.forward({
        "observations": {k: jnp.asarray(v) for k, v in obs.items()},
        "rnn_states": jnp.asarray(rnn_states),
        "prev_actions": jnp.asarray(prev_actions),
        "masks": jnp.asarray(masks),
        "mode": "inference",
    })
    np.testing.assert_array_equal(
        np.asarray(acts).ravel(), t_logits.argmax(-1).numpy().ravel())

    # warm-start integration: the SAME torch module saved as a reference
    # checkpoint dir loads through from_pretrained's auto-detect routing
    # (model/base.py TORCH_CONVERTER_NAME) to the identical param tree
    import tempfile

    import jax as _jax

    with tempfile.TemporaryDirectory() as d:
        torch.save(ref.state_dict(), f"{d}/model.pth")
        pol2 = get_policy("cma").from_pretrained(d, get_config("cma"))
    leaves = _jax.tree_util.tree_leaves(params)
    leaves2 = _jax.tree_util.tree_leaves(pol2.params)
    assert len(leaves) == len(leaves2)
    for a, b in zip(leaves, leaves2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-6)


@pytest.mark.slow
def test_seq2seq_policy_conversion_forward_parity():
    from internnav_tpu.model import get_config, get_policy
    from internnav_tpu.model.weights.convert import convert_seq2seq_policy

    torch.manual_seed(1)
    cfg = get_config("seq2seq")
    ref = TorchSeq2Seq(vocab=cfg.text_encoder.vocab_size).eval()
    _randomize_bn(ref)
    params = convert_seq2seq_policy(_sd_numpy(ref))

    rs = np.random.RandomState(2)
    obs = _obs(rs)
    rnn_states = rs.randn(2, 1, 512).astype(np.float32)
    prev_actions = np.array([1, 3], np.int64)
    masks = np.array([1.0, 0.0], np.float32)

    with torch.no_grad():
        t_logits, t_states, t_prog = ref(
            {k: torch.tensor(v) for k, v in obs.items()},
            torch.tensor(rnn_states), torch.tensor(prev_actions),
            torch.tensor(masks),
        )
    pol = get_policy("seq2seq").build(cfg)
    pol.params = params
    logits, states, prog = pol.forward({
        "observations": {k: jnp.asarray(v) for k, v in obs.items()},
        "rnn_states": jnp.asarray(rnn_states),
        "prev_actions": jnp.asarray(prev_actions),
        "masks": jnp.asarray(masks),
        "mode": "train",
    })
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=6e-3, rtol=6e-3)
    np.testing.assert_allclose(np.asarray(states), t_states.numpy(),
                               atol=6e-3, rtol=6e-3)
    np.testing.assert_allclose(np.asarray(prog), t_prog.numpy(), atol=6e-3,
                               rtol=6e-3)
