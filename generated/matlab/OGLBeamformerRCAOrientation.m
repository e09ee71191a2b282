classdef OGLBeamformerRCAOrientation < int32
	enumeration
		None (0)
		Rows (1)
		Columns (2)
	end
end