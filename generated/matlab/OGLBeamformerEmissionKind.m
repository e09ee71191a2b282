classdef OGLBeamformerEmissionKind < int32
	enumeration
		Sine (0)
		Chirp (1)
	end
end