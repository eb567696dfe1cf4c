import os
import tempfile

from pgmpy_tpu.readwrite.pomdpx import PomdpXReader, PomdpXWriter

POMDPX = """<pomdpx version="1.0" id="rockSample">
  <Description>Tiny rock sample</Description>
  <Discount>0.95</Discount>
  <Variable>
    <StateVar vnamePrev="rover_0" vnameCurr="rover_1" fullyObs="true">
      <NumValues>3</NumValues>
    </StateVar>
    <StateVar vnamePrev="rock_0" vnameCurr="rock_1">
      <ValueEnum>good bad</ValueEnum>
    </StateVar>
    <ObsVar vname="obs_sensor">
      <ValueEnum>ogood obad</ValueEnum>
    </ObsVar>
    <ActionVar vname="action_rover">
      <ValueEnum>amw ame ac as</ValueEnum>
    </ActionVar>
    <RewardVar vname="reward_rover" />
  </Variable>
  <InitialStateBelief>
    <CondProb>
      <Var>rover_0</Var>
      <Parent>null</Parent>
      <Parameter type="TBL">
        <Entry>
          <Instance>-</Instance>
          <ProbTable>0.0 1.0 0.0</ProbTable>
        </Entry>
      </Parameter>
    </CondProb>
  </InitialStateBelief>
  <StateTransitionFunction>
    <CondProb>
      <Var>rover_1</Var>
      <Parent>action_rover rover_0</Parent>
      <Parameter type="TBL">
        <Entry>
          <Instance>amw s0 s2</Instance>
          <ProbTable>1.0</ProbTable>
        </Entry>
      </Parameter>
    </CondProb>
  </StateTransitionFunction>
  <ObsFunction>
    <CondProb>
      <Var>obs_sensor</Var>
      <Parent>action_rover rover_1 rock_1</Parent>
      <Parameter type="TBL">
        <Entry>
          <Instance>amw * * -</Instance>
          <ProbTable>1.0 0.0</ProbTable>
        </Entry>
      </Parameter>
    </CondProb>
  </ObsFunction>
  <RewardFunction>
    <Func>
      <Var>reward_rover</Var>
      <Parent>action_rover rover_0 rock_0</Parent>
      <Parameter type="TBL">
        <Entry>
          <Instance>ame s1 *</Instance>
          <ValueTable>10</ValueTable>
        </Entry>
      </Parameter>
    </Func>
  </RewardFunction>
</pomdpx>"""


class TestPomdpX:
    def test_reader(self):
        reader = PomdpXReader(string=POMDPX)
        assert reader.get_discount() == 0.95
        variables = reader.get_variables()
        assert variables["StateVar"][0]["ValueEnum"] == ["s0", "s1", "s2"]
        assert variables["StateVar"][0]["fullyObs"] is True
        assert variables["ObsVar"][0]["vname"] == "obs_sensor"
        beliefs = reader.get_initial_beliefs()
        assert beliefs[0]["Var"] == "rover_0"
        assert beliefs[0]["Parameter"][0]["ProbTable"] == ["0.0", "1.0", "0.0"]
        trans = reader.get_state_transition_function()
        assert trans[0]["Parent"] == ["action_rover", "rover_0"]
        rewards = reader.get_reward_function()
        assert rewards[0]["Parameter"][0]["ValueTable"] == ["10"]

    def test_roundtrip(self):
        reader = PomdpXReader(string=POMDPX)
        model_data = {
            "description": reader.get_description(),
            "discount": reader.get_discount(),
            "variables": reader.get_variables(),
            "initial_state_belief": reader.get_initial_beliefs(),
            "state_transition_function": reader.get_state_transition_function(),
            "obs_function": reader.get_obs_function(),
            "reward_function": reader.get_reward_function(),
        }
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.pomdpx")
            PomdpXWriter(model_data).write_file(path)
            back = PomdpXReader(path=path)
        assert back.get_discount() == 0.95
        assert back.get_variables() == model_data["variables"]
        assert back.get_state_transition_function() == model_data["state_transition_function"]
        assert back.get_reward_function() == model_data["reward_function"]


POMDPX_DD = """<?xml version="1.0" encoding="ISO-8859-1"?>
<pomdpx version="1.0" id="rockSampleDD">
  <Description>DD-parameter fixture</Description>
  <Discount>0.95</Discount>
  <Variable>
    <StateVar vnamePrev="rover_0" vnameCurr="rover_1" fullyObs="true">
      <ValueEnum>s0 s1 s2</ValueEnum>
    </StateVar>
    <StateVar vnamePrev="rock_0" vnameCurr="rock_1">
      <ValueEnum>good bad</ValueEnum>
    </StateVar>
    <ActionVar vname="action_rover">
      <ValueEnum>amw ame</ValueEnum>
    </ActionVar>
  </Variable>
  <InitialStateBelief>
    <CondProb>
      <Var>rover_0</Var>
      <Parent>null</Parent>
      <Parameter type="DD">
        <DAG>
          <Node var="rover_0">
            <Edge val="s0"><Terminal>0.0</Terminal></Edge>
            <Edge val="s1"><SubDAG type="uniform" var="rock_0"/></Edge>
            <Edge val="s2"><Terminal>0.0</Terminal></Edge>
          </Node>
        </DAG>
      </Parameter>
    </CondProb>
  </InitialStateBelief>
  <StateTransitionFunction>
    <CondProb>
      <Var>rover_1</Var>
      <Parent>action_rover rover_0</Parent>
      <Parameter type="DD">
        <SubDAGTemplate id="moveTemplate">
          <Node var="rock_0">
            <Edge val="good"><Terminal>0.9</Terminal></Edge>
            <Edge val="bad"><Terminal>0.1</Terminal></Edge>
          </Node>
        </SubDAGTemplate>
        <DAG>
          <Node var="action_rover">
            <Edge val="amw">
              <Node var="rover_0">
                <Edge val="s0"><Terminal>1.0</Terminal></Edge>
                <Edge val="s1"><SubDAG type="template" idref="moveTemplate"/></Edge>
                <Edge val="s2"><Terminal>0.0</Terminal></Edge>
              </Node>
            </Edge>
            <Edge val="ame"><SubDAG type="deterministic" var="rover_1" val="s2"/></Edge>
          </Node>
        </DAG>
      </Parameter>
    </CondProb>
  </StateTransitionFunction>
</pomdpx>
"""


class TestPomdpXDD:
    def test_dd_initial_belief(self):
        reader = PomdpXReader(string=POMDPX_DD)
        assert reader.get_initial_beliefs() == [
            {
                "Var": "rover_0",
                "Parent": ["null"],
                "Type": "DD",
                "Parameter": {
                    "rover_0": {
                        "s0": "0.0",
                        "s1": {"type": "uniform", "var": "rock_0"},
                        "s2": "0.0",
                    }
                },
            }
        ]

    def test_dd_transition_with_template(self):
        reader = PomdpXReader(string=POMDPX_DD)
        out = reader.get_state_transition_function()
        assert out[0]["Type"] == "DD"
        param = out[0]["Parameter"]
        assert param["id"] == "moveTemplate"
        assert param["SubDAGTemplate"] == {
            "rock_0": {"good": "0.9", "bad": "0.1"}
        }
        assert param["action_rover"]["amw"] == {
            "rover_0": {
                "s0": "1.0",
                "s1": {"type": "template", "idref": "moveTemplate"},
                "s2": "0.0",
            }
        }
        assert param["action_rover"]["ame"] == {
            "type": "deterministic", "var": "rover_1", "val": "s2",
        }

    def test_dd_roundtrip(self):
        reader = PomdpXReader(string=POMDPX_DD)
        model_data = {
            "description": reader.get_description(),
            "discount": reader.get_discount(),
            "variables": reader.get_variables(),
            "initial_state_belief": reader.get_initial_beliefs(),
            "state_transition_function": reader.get_state_transition_function(),
            "obs_function": [],
            "reward_function": [],
        }
        back = PomdpXReader(string=str(PomdpXWriter(model_data)))
        assert back.get_initial_beliefs() == model_data["initial_state_belief"]
        assert (
            back.get_state_transition_function()
            == model_data["state_transition_function"]
        )
