classdef OGLBeamformerFilterKind < int32
	enumeration
		Kaiser (0)
		MatchedChirp (1)
	end
end